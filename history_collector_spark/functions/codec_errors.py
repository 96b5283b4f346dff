"""Shared base exception for the pure-Python media codecs.

``ImageDecodeError`` lives here (not in ``queries/multimodal.py``) so
that format-specific codec modules (``functions/jpeg.py``) can subclass
it without importing the query layer — the query layer imports the
codecs, so the reverse import would be a cycle. Every codec error that
the Arrow decode kernels must degrade gracefully on (malformed blob →
``decode_status='error: …'`` instead of a task failure) must derive
from this class.
"""

from __future__ import annotations


class MediaDecodeError(ValueError):
    """Malformed or unsupported media payload (any modality)."""


class ImageDecodeError(MediaDecodeError):
    """Malformed or unsupported image payload."""


class AudioDecodeError(MediaDecodeError):
    """Malformed or unsupported audio payload."""
