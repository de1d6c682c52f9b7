from aesara_tpu.scan.basic import scan, until
from aesara_tpu.scan.op import Scan, ScanInfo
from aesara_tpu.scan.views import foldl, foldr, map, reduce
from aesara_tpu.scan.checkpoints import scan_checkpoints
from aesara_tpu.scan import utils  # noqa: F401
from aesara_tpu.scan.utils import ScanArgs  # noqa: F401
