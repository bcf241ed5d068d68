"""Declarative log-format model (the reference's `logdef`).

The reference describes a log format as a protobuf `logdef`
(reference: miw/log_definition.proto:24-68) authored as JSON
(miw/formats/*.json) and compiled to a binary .fmt. We read the JSON
directly — the protobuf step is a build artifact we drop — and model it
as plain dataclasses with validation.

Field semantics (reference: miw/log_definition.proto:33-58):

* ``pos`` — 0-based token position; -1 means "previous field's position
  + 1" (auto-increment, miw/log_format.cc:250-254).
* ``type`` — int / string / bool / float / date / time / url
  (dispatch miw/log_format.cc:503-538).
* ``key`` — field participates in the composite group key
  (miw/log_format.cc:557-563).
* ``aggregation`` — count, sum, max, mean, variance, union,
  union_count, ratio (miw/log_record.cc:262-301).
* ``processing`` — date/time bucketing: day month year hour minute
  second (miw/log_format.cc:401-472), width ``processing_offset``.
* ``preprocessing`` — row-extending derivations evtxcsv / evtxcsv2 /
  microsoftdnslogs (miw/log_format.cc:540-555).
* ``filter``/``filter_type`` — "contain" indicator column summed per
  group (miw/log_format.cc:718-751).
* ``match`` — row-level predicate (miw/log_definition.proto:24-31).
* ``numerator``/``denominator`` — operands for aggregation "ratio";
  either a field name or the literal "logs" = group row count
  (miw/log_record.cc:747-823).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from pathlib import Path


def lenient_json_loads(text: str) -> dict:
    """Parse format JSON the way the reference's jsoncpp does: tolerate
    trailing commas and // comments (anon_bluecoat_format.json in the
    reference tree carries a trailing comma). Strict parse first; on
    failure, strip comments outside strings and commas dangling before
    a closing brace/bracket, then reparse."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        no_comments = re.sub(r'("(?:[^"\\]|\\.)*")|//[^\n]*', r"\1", text)
        no_trailing = re.sub(r",(\s*[}\]])", r"\1", no_comments)
        return json.loads(no_trailing)

FIELD_TYPES = {"int", "string", "bool", "float", "date", "time", "url"}
AGGREGATIONS = {
    "count",
    "sum",
    "max",
    "mean",
    "variance",
    "union",
    "union_count",
    "ratio",
}
PROCESSINGS = {"day", "month", "year", "hour", "minute", "second", ""}
PREPROCESSINGS = {"evtxcsv", "evtxcsv2", "microsoftdnslogs", ""}
KV_PREPROCESSINGS = {"evtxcsv", "evtxcsv2"}  # yield map<k,v> columns

DEFAULT_DATE_FORMAT = "%m/%d/%Y"  # miw/log_definition.proto:50
DEFAULT_URL_FORMAT = "%scheme://%host%port"  # miw/log_definition.proto:54


@dataclass
class MatchSpec:
    """Row-level predicate attached to a field.

    reference: miw/log_definition.proto:24-31, applied in
    miw/log_format.cc:277-399 with the OR-survival check at :566-568.
    """

    match_str: str | None = None
    match_file: str | None = None
    logic: str = "or"  # "and" | "or" (proto default "or")
    negative: bool = False
    exact: bool = False

    def values(self, base_dir: str | Path | None = None) -> list[str]:
        """Resolve the match value set: a single literal, or the lines of
        ``match_file`` (newline-delimited, loaded once —
        miw/log_format.cc:280-325)."""
        if self.match_str is not None:
            return [self.match_str]
        if self.match_file:
            p = Path(self.match_file)
            if base_dir is not None and not p.is_absolute():
                p = Path(base_dir) / p
            return [ln for ln in p.read_text().splitlines() if ln.strip()]
        return []


@dataclass
class Field:
    name: str
    pos: int = -1  # -1 = auto-increment from previous field
    type: str = "string"
    key: bool = False
    aggregation: str | None = None
    processing: str = ""
    preprocessing: str = ""
    date_format: str = DEFAULT_DATE_FORMAT
    processing_offset: int = 1
    filter: str | None = None
    filter_type: str | None = None
    url_format: str = DEFAULT_URL_FORMAT
    match: MatchSpec | None = None
    numerator: str | None = None
    denominator: str | None = None
    # k/v-derived field: value = <from_kv field's map>[this field's name]
    # — the Spark analog of the reference's dynamic schema extension
    # where every payload k/v becomes a first-class field
    # (miw/log_format.cc:570-576,606-678). Declared fields may set any
    # key/aggregation; auto-discovered ones are plain strings.
    from_kv: str | None = None

    # resolved by LogDef.__post_init__
    resolved_pos: int = dc_field(default=-1, repr=False)

    @property
    def is_filter_contain(self) -> bool:
        return self.filter is not None and (self.filter_type or "contain") == "contain"

    @property
    def projects(self) -> bool:
        """Whether the field reads a token at parse time. Ratio fields
        are computed from the final aggregate states only
        (miw/log_record.cc:747-823) and k/v-derived fields read a map
        entry, not a token — neither consumes a token position."""
        return self.aggregation != "ratio" and self.from_kv is None

    def validate(self) -> None:
        if self.type not in FIELD_TYPES:
            raise ValueError(f"field {self.name!r}: unknown type {self.type!r}")
        if self.aggregation is not None and self.aggregation not in AGGREGATIONS:
            raise ValueError(
                f"field {self.name!r}: unknown aggregation {self.aggregation!r}"
            )
        if self.processing not in PROCESSINGS:
            raise ValueError(
                f"field {self.name!r}: unknown processing {self.processing!r}"
            )
        if self.preprocessing not in PREPROCESSINGS:
            raise ValueError(
                f"field {self.name!r}: unknown preprocessing {self.preprocessing!r}"
            )
        if self.aggregation == "ratio" and not (self.numerator and self.denominator):
            raise ValueError(
                f"field {self.name!r}: ratio needs numerator and denominator"
            )


@dataclass
class LogDef:
    """A complete log format: delimiters + fields.

    reference: miw/log_definition.proto:60-68 (format_name, delims,
    fields, appname, quotechar, commentchar).
    """

    format_name: str
    delims: str = ","
    fields: list[Field] = dc_field(default_factory=list)
    appname: str = ""
    quotechar: str = ""
    commentchar: str = ""
    base_dir: str | None = None  # for resolving match_file paths

    def __post_init__(self) -> None:
        if not self.fields:
            raise ValueError("format has no fields")
        if not self.delims:
            raise ValueError("format has empty delims")
        # auto-increment positions (miw/log_format.cc:250-254): a field
        # with pos == -1 takes previous field's position + 1.
        prev = -1
        for f in self.fields:
            f.validate()
            if not f.projects:
                f.resolved_pos = -1
                continue
            f.resolved_pos = f.pos if f.pos >= 0 else prev + 1
            prev = f.resolved_pos
        names = [f.name for f in self.fields]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate field names in {self.format_name}")
        kv_sources = {
            f.name for f in self.fields if f.preprocessing in KV_PREPROCESSINGS
        }
        for f in self.fields:
            if f.from_kv is not None and f.from_kv not in kv_sources:
                raise ValueError(
                    f"field {f.name!r}: from_kv={f.from_kv!r} is not an "
                    "evtxcsv/evtxcsv2 preprocessing field"
                )

    @property
    def key_fields(self) -> list[Field]:
        return [f for f in self.fields if f.key]

    @property
    def max_pos(self) -> int:
        return max(f.resolved_pos for f in self.fields if f.projects)

    def field_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    # ---- JSON loading (the reference's authoring format) ----

    @classmethod
    def from_json(cls, obj: dict, base_dir: str | None = None) -> "LogDef":
        fields = []
        for fo in obj.get("fields", []):
            match = None
            if "match" in fo:
                mo = fo["match"]
                unknown = set(mo) - {
                    "match_str", "match_file", "logic", "negative", "exact"
                }
                if unknown:
                    # a typo here would silently disable the filter
                    raise ValueError(
                        f"field {fo.get('name')!r}: unknown match keys "
                        f"{sorted(unknown)} (expected match_str/match_file/"
                        "logic/negative/exact)"
                    )
                match = MatchSpec(
                    match_str=mo.get("match_str"),
                    match_file=mo.get("match_file"),
                    logic=mo.get("logic", "or"),
                    negative=bool(mo.get("negative", False)),
                    exact=bool(mo.get("exact", False)),
                )
            fields.append(
                Field(
                    name=fo["name"],
                    pos=int(fo.get("pos", -1)),
                    type=fo.get("type", "string"),
                    key=bool(fo.get("key", False)),
                    aggregation=fo.get("aggregation")
                    if fo.get("aggregated") or fo.get("aggregation")
                    else None,
                    processing=fo.get("processing", ""),
                    preprocessing=fo.get("preprocessing", ""),
                    date_format=fo.get("date_format", DEFAULT_DATE_FORMAT),
                    processing_offset=int(fo.get("processing_offset", 1)),
                    filter=fo.get("filter"),
                    filter_type=fo.get("filter_type"),
                    url_format=fo.get("url_format", DEFAULT_URL_FORMAT),
                    match=match,
                    numerator=fo.get("numerator"),
                    denominator=fo.get("denominator"),
                    from_kv=fo.get("from_kv"),
                )
            )
        return cls(
            format_name=obj["format_name"],
            delims=obj.get("delims", ","),
            fields=fields,
            appname=obj.get("appname", ""),
            quotechar=obj.get("quotechar", "") or "",
            commentchar=obj.get("commentchar", "") or "",
            base_dir=base_dir,
        )

    @classmethod
    def load(cls, path: str | Path) -> "LogDef":
        p = Path(path)
        if p.suffix == ".fmt":
            # compiled binary protobuf (miw/log_format.cc:62-77)
            from cybersecurity_miw_spark.plans.fmtproto import load_fmt

            return load_fmt(p)
        return cls.from_json(lenient_json_loads(p.read_text()), base_dir=str(p.parent))
