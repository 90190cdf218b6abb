"""File and network IQ ingest/egress."""

from . import wav  # noqa: F401
