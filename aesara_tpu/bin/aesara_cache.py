"""Reference console-script name (reference ``bin/aesara_cache.py``):
forwards to the cache CLI."""
from aesara_tpu.bin.cache_cli import main  # noqa: F401

if __name__ == "__main__":
    main()
