from aesara_tpu.link.basic import Container, Linker, LocalLinker, PerformLinker, WrapLinker
