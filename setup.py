"""Build hook: compile the native meshproc library alongside the package.

The library is a plain C ABI shared object consumed via ctypes (no
pybind11 dependency); it also auto-builds lazily on first import, so this
hook is an optimization for installed distributions.
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        src = Path("worldrenderer_tpu/meshproc/native/meshproc.cpp")
        out = src.with_name("libmeshproc.so")
        if src.exists():
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                     str(src), "-o", str(out)],
                    check=True,
                )
            except Exception as e:  # noqa: BLE001 - fall back to lazy build
                print(f"meshproc native build skipped: {e}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
