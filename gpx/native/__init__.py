"""Native (C++) runtime components, loaded via ctypes.

Currently: the fast CSV chain writer/reader (fastcsv.cpp) backing gpx.io.
The shared object is built on demand with g++ (gpx.native.build); every
native entry point has a pure-Python fallback so the framework degrades
gracefully on machines without a toolchain.
"""

from gpx.native.build import load_fastcsv

__all__ = ["load_fastcsv"]
