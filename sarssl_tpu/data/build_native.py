"""Build the native C++ kernels: ``python -m sarssl_tpu.data.build_native``."""
import os
import subprocess

CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")


def build(verbose: bool = True) -> str:
    src = os.path.join(CSRC, "ism.cpp")
    out = os.path.join(CSRC, "libism.so")
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
    from sarssl_tpu.data import native
    assert native.available(), "library did not load"
    print("loads OK")
