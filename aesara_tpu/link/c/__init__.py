"""C++ host runtime: the native VM and compile cache
(SURVEY §2.11 item 1 — the lazylinker_c.c / CVM replacement)."""

from aesara_tpu.link.c.build import compile_and_load, get_cvm_module, lock_ctx, module_hash
from aesara_tpu.link.c.vm_linker import CVMLinker
