"""RFC 6901 JSON Pointers for violation locations.

Semantics mirror the reference implementation
(`/root/reference/json_schema_rs/src/json_pointer.rs:36-108, 220-236`):
segments are escaped with ``~`` -> ``~0`` and ``/`` -> ``~1``; the root
pointer is the empty string and *displays* as ``"root"``.
"""

from __future__ import annotations


def escape_segment(segment: str) -> str:
    """Escape one pointer segment (json_pointer.rs:36-38)."""
    return segment.replace("~", "~0").replace("/", "~1")


def unescape_segment(segment: str) -> str:
    return segment.replace("~1", "/").replace("~0", "~")


class JsonPointer:
    """Immutable JSON Pointer; ``push`` returns a new pointer."""

    __slots__ = ("encoded",)

    def __init__(self, encoded: str = "") -> None:
        self.encoded = encoded

    @classmethod
    def root(cls) -> "JsonPointer":
        return cls("")

    def push(self, segment: str) -> "JsonPointer":
        return JsonPointer(self.encoded + "/" + escape_segment(segment))

    def as_str(self) -> str:
        return self.encoded

    def display_root_or_path(self) -> str:
        """``"root"`` when empty, else the encoded pointer
        (json_pointer.rs:230-236)."""
        return "root" if self.encoded == "" else self.encoded

    def __eq__(self, other: object) -> bool:
        return isinstance(other, JsonPointer) and self.encoded == other.encoded

    def __hash__(self) -> int:
        return hash(self.encoded)

    def __repr__(self) -> str:
        return f"JsonPointer({self.encoded!r})"

    def __str__(self) -> str:
        return self.encoded
