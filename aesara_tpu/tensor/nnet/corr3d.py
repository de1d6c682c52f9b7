"""Reference import-path alias: ``nnet/corr3d.py`` — see ``corr.py``;
3d convs ride the same ``conv_general_dilated`` lowering."""
from aesara_tpu.tensor.nnet.conv3d2d import conv3d  # noqa: F401
