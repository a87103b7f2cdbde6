"""Environment compatibility shims.

fsspec's HTTP filesystem cannot import in this environment (aiohttp is not
installed). Ray Data's path resolution re-attempts
``from fsspec.implementations.http import HTTPFileSystem`` on every
read/write; the import always fails, and two threads attempting it
concurrently can observe a partially-initialized module in sys.modules —
surfacing as a plain ImportError that Ray's ``except ModuleNotFoundError``
does not catch. Seen with concurrent shard executions in run_kg.

Fix: register a minimal stub module once. Ray only uses HTTPFileSystem in
``isinstance`` checks (path_util._is_http_filesystem), so a stand-in class
is safe — local/S3 filesystems are never instances of it. If aiohttp is ever
installed, the real module imports and the stub is not used.
"""

from __future__ import annotations

import sys
import types


def ensure_thread_safe_fsspec_http() -> None:
    try:
        import fsspec.implementations.http  # noqa: F401

        return
    except ImportError:
        pass

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # stand-in used only in isinstance checks
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


ensure_thread_safe_fsspec_http()
