"""File backends; parity ``datasets/file_backend.py`` (/root/reference).

``HardDiskBackend`` is the only backend any config uses
(``datasets/file_backend.py:106-120``); ``PetrelBackend`` (S3) is declared
for config compatibility and raises unless the petrel SDK is present
(dead code in the reference too — SURVEY.md §7 non-goals).
"""

from __future__ import annotations

from typing import Optional


class HardDiskBackend:
    """Read bytes from local disk."""

    def get(self, filepath: str) -> Optional[bytes]:
        try:
            with open(filepath, "rb") as f:
                return f.read()
        except OSError:
            return None


class PetrelBackend:
    """S3 backend via the petrel-oss SDK (config-compat stub)."""

    def __init__(self, *args, **kwargs):
        try:
            from petrel_client import client  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "PetrelBackend requires the petrel_client SDK (not available "
                "in this environment); use HardDiskBackend."
            ) from e
        self._client = client.Client(*args, **kwargs)

    def get(self, filepath: str) -> Optional[bytes]:  # pragma: no cover
        return memoryview(self._client.get(filepath)).tobytes()
