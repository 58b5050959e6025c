"""Minimal parquet footer reader (Thrift compact protocol).

pyarrow 16 does not expose bloom-filter metadata, so asserting that the
writer's ``parquet.bloom.filter.enabled#col`` options actually took effect
needs the footer itself: ColumnMetaData field 14 (``bloom_filter_offset``)
is set iff a bloom filter was written for that column chunk. This module
walks the footer's FileMetaData struct generically — structs become
``{field_id: value}`` dicts, lists become lists, binary stays ``bytes`` —
and exposes :func:`bloom_filter_offsets` for the test layer.

The Thrift compact wire format implemented here is the public spec
(thrift.apache.org, ``doc/specs/thrift-compact-protocol.md``); the parquet
field ids are from the public ``parquet-format`` ``parquet.thrift``:
FileMetaData.row_groups = 4, RowGroup.columns = 1, ColumnChunk.meta_data
= 3, ColumnMetaData.path_in_schema = 3, .bloom_filter_offset = 14.
"""

from __future__ import annotations

import struct

# compact-protocol type nibbles
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_I8 = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def value(self, ttype: int):
        if ttype == _BOOL_TRUE:
            return True
        if ttype == _BOOL_FALSE:
            return False
        if ttype in (_I8,):
            return self.byte()
        if ttype in (_I16, _I32, _I64):
            return self.zigzag()
        if ttype == _DOUBLE:
            v = struct.unpack("<d", self.buf[self.pos : self.pos + 8])[0]
            self.pos += 8
            return v
        if ttype == _BINARY:
            return self.binary()
        if ttype in (_LIST, _SET):
            return self.list_()
        if ttype == _MAP:
            return self.map_()
        if ttype == _STRUCT:
            return self.struct()
        raise ValueError(f"unknown compact type {ttype}")

    def list_(self) -> list:
        head = self.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = self.varint()
        # bool list elements are encoded as the BOOL_TRUE/FALSE value bytes
        return [self.value(etype) for _ in range(size)]

    def map_(self) -> dict:
        size = self.varint()
        if size == 0:
            return {}
        head = self.byte()
        ktype, vtype = head >> 4, head & 0x0F
        return {
            self.value(ktype): self.value(vtype) for _ in range(size)
        }

    def struct(self) -> dict:
        out: dict = {}
        fid = 0
        while True:
            head = self.byte()
            if head == _STOP:
                return out
            delta = head >> 4
            ttype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            out[fid] = self.value(ttype)


def read_footer(path: str) -> dict:
    """The file's FileMetaData struct as nested {field_id: value} dicts."""
    with open(path, "rb") as f:
        f.seek(-8, 2)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: not a parquet file")
        flen = struct.unpack("<I", tail[:4])[0]
        f.seek(-(8 + flen), 2)
        return _Reader(f.read(flen)).struct()


def bloom_filter_offsets(path: str) -> list[dict]:
    """Per row group: {dotted column path: bloom_filter_offset or None}.

    None means NO bloom filter was written for that column chunk — the
    exact signal the writer-option test needs (a silently dropped
    ``parquet.bloom.filter.enabled#col`` shows up as None here, whatever
    the file size does)."""
    meta = read_footer(path)
    out = []
    for rg in meta.get(4, []):
        row = {}
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            col = ".".join(
                p.decode("utf-8", "replace") for p in md.get(3, [])
            )
            row[col] = md.get(14)
        out.append(row)
    return out
