"""Build libnsgrid.so (idempotent; rebuilds when the source is newer)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "nsgrid.cpp")
LIB = os.path.join(HERE, "libnsgrid.so")


def ensure_built() -> str | None:
    """Return the library path, building if needed; None if no toolchain."""
    try:
        if (os.path.exists(LIB)
                and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
            return LIB
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17", "-shared", "-fPIC",
             "-pthread", SRC, "-o", LIB],
            check=True, capture_output=True)
        return LIB
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"[nsgrid] native build unavailable: {e}", file=sys.stderr)
        return None


if __name__ == "__main__":
    print(ensure_built())
