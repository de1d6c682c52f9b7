"""Reference import-path alias: ``configparser.py`` → ``config.py``
(the reference's AesaraConfigParser is our ``_Config``)."""
from aesara_tpu.config import (  # noqa: F401
    BoolParam,
    ConfigParam,
    EnumStr,
    FloatParam,
    IntParam,
    StrParam,
    _Config as AesaraConfigParser,
    change_flags,
    config,
)
