"""Binary ``.fmt`` format loader.

The reference compiles its JSON format definitions to binary protobuf
(``miw/formats/format_json2pb.py:9-19`` serializes a ``logdef`` message,
schema ``miw/log_definition.proto:33-68``) and ``log_format.cc:62-77``
loads the ``.fmt`` at run time. A reference user may only have the
shipped ``.fmt`` files — this module decodes them straight to
:class:`~cybersecurity_miw_spark.plans.logdef.LogDef` with a minimal
pure-Python protobuf wire-format reader (varint / zigzag /
length-delimited — no protobuf dependency).

Runtime-state fields of the schema (``int_fi``/``str_fi``/``bool_fi``/
``real_fi``/``count``, tags 8-12 — per-record aggregation accumulators,
not format definition) are skipped.
"""

from __future__ import annotations

from pathlib import Path

from cybersecurity_miw_spark.plans.logdef import (
    DEFAULT_DATE_FORMAT,
    DEFAULT_URL_FORMAT,
    Field,
    LogDef,
    MatchSpec,
)

_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint in .fmt")
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow in .fmt")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes):
    """Yield (tag, wire_type, value) triples; value is int for varints
    and bytes for length-delimited payloads."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        tag, wt = key >> 3, key & 7
        if wt == _VARINT:
            v, i = _read_varint(buf, i)
        elif wt == _LEN:
            n, i = _read_varint(buf, i)
            if i + n > len(buf):
                raise ValueError("truncated length-delimited value in .fmt")
            v = buf[i : i + n]
            i += n
        elif wt == _I64:
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == _I32:
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} in .fmt")
        yield tag, wt, v


def _s(v: bytes) -> str:
    return v.decode("utf-8")


def _decode_match(buf: bytes) -> MatchSpec:
    m = MatchSpec()
    for tag, _, v in _fields(buf):
        if tag == 1:
            m.match_str = _s(v)
        elif tag == 2:
            m.logic = _s(v)
        elif tag == 3:
            m.negative = bool(v)
        elif tag == 4:
            m.match_file = _s(v)
        elif tag == 5:
            m.exact = bool(v)
    return m


def _decode_field(buf: bytes) -> Field:
    kw: dict = {"name": ""}
    aggregated = False
    aggregation: str | None = None
    for tag, _, v in _fields(buf):
        if tag == 1:
            kw["name"] = _s(v)
        elif tag == 2:
            kw["pos"] = _zigzag(v)  # sint32 (proto:35)
        elif tag == 3:
            kw["type"] = _s(v)
        elif tag == 4:
            kw["key"] = bool(v)
        elif tag == 5:
            aggregated = bool(v)
        elif tag == 6:
            aggregation = _s(v)
        elif tag == 7:
            kw["processing"] = _s(v)
        elif tag in (8, 9, 10, 11, 12):
            continue  # runtime accumulator state, not definition
        elif tag == 13:
            kw["preprocessing"] = _s(v)
        elif tag == 14:
            kw["date_format"] = _s(v)
        elif tag == 15:
            kw["processing_offset"] = int(v)
        elif tag == 17:
            kw["filter"] = _s(v)
        elif tag == 18:
            kw["filter_type"] = _s(v)
        elif tag == 20:
            kw["url_format"] = _s(v)
        elif tag == 21:
            kw["match"] = _decode_match(v)
        elif tag == 22:
            kw["numerator"] = _s(v)
        elif tag == 23:
            kw["denominator"] = _s(v)
    kw.setdefault("date_format", DEFAULT_DATE_FORMAT)
    kw.setdefault("url_format", DEFAULT_URL_FORMAT)
    # same rule as LogDef.from_json: an aggregation takes effect when
    # either the flag or the aggregation name is present
    kw["aggregation"] = aggregation if (aggregated or aggregation) else None
    return Field(**kw)


def _enc_varint(n: int) -> bytes:
    if n < 0:
        # Python's arithmetic right shift never zeroes a negative int,
        # so the encode loop below would spin forever — negative
        # values must arrive pre-mapped (zigzag for sint fields)
        raise ValueError(f"varint fields cannot encode negative value {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_tag(tag: int, wt: int) -> bytes:
    return _enc_varint((tag << 3) | wt)


def _enc_str(tag: int, s: str) -> bytes:
    b = s.encode("utf-8")
    return _enc_tag(tag, _LEN) + _enc_varint(len(b)) + b


def _enc_bool(tag: int, v: bool) -> bytes:
    return _enc_tag(tag, _VARINT) + _enc_varint(1 if v else 0)


def _enc_uint(tag: int, v: int) -> bytes:
    return _enc_tag(tag, _VARINT) + _enc_varint(v)


def _enc_sint(tag: int, v: int) -> bytes:
    return _enc_tag(tag, _VARINT) + _enc_varint((v << 1) ^ (v >> 63))


def _enc_msg(tag: int, payload: bytes) -> bytes:
    return _enc_tag(tag, _LEN) + _enc_varint(len(payload)) + payload


def _encode_match(m: MatchSpec) -> bytes:
    out = bytearray()
    if m.match_str is not None:
        out += _enc_str(1, m.match_str)
    if m.logic != "or":
        out += _enc_str(2, m.logic)
    if m.negative:
        out += _enc_bool(3, True)
    if m.match_file:
        out += _enc_str(4, m.match_file)
    if m.exact:
        out += _enc_bool(5, True)
    return bytes(out)


def _encode_field(f: Field) -> bytes:
    out = bytearray()
    out += _enc_str(1, f.name)
    if f.pos != -1:
        out += _enc_sint(2, f.pos)
    out += _enc_str(3, f.type)
    if f.key:
        out += _enc_bool(4, True)
    if f.aggregation:
        out += _enc_bool(5, True)
        out += _enc_str(6, f.aggregation)
    if f.processing:
        out += _enc_str(7, f.processing)
    if f.preprocessing:
        out += _enc_str(13, f.preprocessing)
    if f.date_format != DEFAULT_DATE_FORMAT:
        out += _enc_str(14, f.date_format)
    if f.processing_offset != 1:
        if f.processing_offset < 0:
            raise ValueError(
                f"field {f.name!r}: processing_offset must be >= 0 "
                f"(got {f.processing_offset}; proto tag 15 is uint32)"
            )
        out += _enc_uint(15, f.processing_offset)
    if f.filter is not None:
        out += _enc_str(17, f.filter)
    if f.filter_type is not None:
        out += _enc_str(18, f.filter_type)
    if f.url_format != DEFAULT_URL_FORMAT:
        out += _enc_str(20, f.url_format)
    if f.match is not None:
        out += _enc_msg(21, _encode_match(f.match))
    if f.numerator is not None:
        out += _enc_str(22, f.numerator)
    if f.denominator is not None:
        out += _enc_str(23, f.denominator)
    return bytes(out)


def save_fmt(ldef: LogDef, path: str | Path) -> None:
    """Compile a LogDef to a binary ``.fmt`` — the write half of the
    reference's format tooling (``miw/formats/format_json2pb.py:9-19``
    serializes the same ``logdef`` message, proto schema
    ``miw/log_definition.proto:33-68``). Non-default scalars are
    omitted exactly as proto2 omits unset optionals, so
    ``load_fmt(save_fmt(x)) == x`` field-for-field and a shipped
    ``.fmt`` re-encodes to a file that decodes identically.

    ``from_kv`` fields (a Spark-side extension with no proto tag) are
    rejected rather than silently dropped."""
    out = bytearray()
    out += _enc_str(1, ldef.format_name)
    out += _enc_str(2, ldef.delims)
    for f in ldef.fields:
        if f.from_kv is not None:
            raise ValueError(
                f"field {f.name!r} uses from_kv, which the reference's "
                ".fmt schema cannot represent — keep such formats in JSON"
            )
        out += _enc_msg(3, _encode_field(f))
    if ldef.appname:
        out += _enc_str(4, ldef.appname)
    if ldef.quotechar:
        out += _enc_str(5, ldef.quotechar)
    if ldef.commentchar:
        out += _enc_str(6, ldef.commentchar)
    Path(path).write_bytes(bytes(out))


def load_fmt(path: str | Path) -> LogDef:
    """Decode a compiled binary ``.fmt`` into a validated LogDef —
    byte-for-byte equivalent to loading its JSON sibling."""
    p = Path(path)
    buf = p.read_bytes()
    kw: dict = {"format_name": "", "delims": ","}
    fields: list[Field] = []
    for tag, _, v in _fields(buf):
        if tag == 1:
            kw["format_name"] = _s(v)
        elif tag == 2:
            kw["delims"] = _s(v)
        elif tag == 3:
            fields.append(_decode_field(v))
        elif tag == 4:
            kw["appname"] = _s(v)
        elif tag == 5:
            kw["quotechar"] = _s(v)
        elif tag == 6:
            kw["commentchar"] = _s(v)
    return LogDef(fields=fields, base_dir=str(p.parent), **kw)
