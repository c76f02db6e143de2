"""Native (C++) runtime components.

The reference is pure Python (SURVEY.md §2: no native components), so these
are framework enhancements, not ports: a multithreaded mmap CSV parser for
the preprocessed all-integer tables (the reference's pandas+torch.save
tensorize path, run.py:194-218, is single-threaded Python).

The shared library builds lazily with g++ on first use and caches next to
the source; every entry point has a pure-NumPy fallback so the framework
works without a toolchain.
"""

from tpurec.native.build import load_library, native_available

__all__ = ["load_library", "native_available"]
