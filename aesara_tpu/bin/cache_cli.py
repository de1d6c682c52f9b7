"""``aesara-tpu-cache`` CLI: inspect/clear the persistent XLA compilation
cache (the reference's ``aesara-cache`` over the C module cache,
``bin/aesara_cache.py``)."""

import os
import shutil
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from aesara_tpu.config import config

    cachedir = config.compiledir
    cmd = argv[0] if argv else "print"
    if cmd in ("print", "list"):
        print(f"cache directory: {cachedir}")
        if os.path.isdir(cachedir):
            total = 0
            n = 0
            for root, _, files in os.walk(cachedir):
                for fn in files:
                    n += 1
                    total += os.path.getsize(os.path.join(root, fn))
            print(f"{n} entries, {total / 1e6:.1f} MB")
        else:
            print("(empty)")
    elif cmd == "clear":
        if os.path.isdir(cachedir):
            shutil.rmtree(cachedir)
            print(f"cleared {cachedir}")
        else:
            print("(already empty)")
    elif cmd == "unlock":
        lock = os.path.join(cachedir, ".lock")
        if os.path.exists(lock):
            os.unlink(lock)
        print("unlocked")
    else:
        print("usage: aesara-tpu-cache [print|list|clear|unlock]")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
