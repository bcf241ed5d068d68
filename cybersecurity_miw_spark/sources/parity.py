"""Exact reference output-shape rendering (§2.6 parity mode).

The reference serializes each aggregated group record to a JSON object
(miw/log_record.cc:649-679) and derives CSV lines from that object
(miw/log_record.cc:681-745). Shape rules reproduced here:

* keys are emitted in byte-wise alphabetical order — jsoncpp's
  ``Json::Value`` is a ``std::map<std::string, ...>`` so iteration is
  ordered;
* a field's value is a SCALAR when the group holds one value and an
  ARRAY when it holds several (miw/log_record.cc:540-560);
* a NULL/absent field value omits the key entirely
  (``if (!jsf.isNull())``, miw/log_record.cc:605);
* ``union_count`` emits ``<name>`` (values) plus ``<name>_count``
  (aligned counts) (miw/log_record.cc:610-614);
* a count-aggregated field emits ``<name>_count`` only when the count
  exceeds 1 (miw/log_record.cc:647-648);
* ``<name>_hold`` carries a non-zero holder state
  (miw/log_record.cc:616-620) — only mean/variance set the holder and
  both divide it out at output, so the key appears for neither; it is
  kept here for sum/count parity should a holder ever be non-zero;
* ``mean`` divides sum/holder at output (miw/log_record.cc:627-632);
  ``variance`` applies (Σx² − (Σx)²/n)/max(1, n−1)
  (miw/log_record.cc:633-641) — our aggregate already emits the final
  scalar for both;
* preprocessing fields (evtxcsv/evtxcsv2/...) are skipped — their
  dynamically-derived fields are emitted instead
  (miw/log_record.cc:495-496);
* metadata keys: ``id``, ``logs`` (int), ``format_name``,
  ``appname`` when set, ``std_date_dt`` (miw/log_record.cc:667-676);
* CSV: strings quoted ``"v"`` (no inner escaping), doubles via C++
  default ostream precision (%g, 6 significant digits), bools as
  1/0, arrays rendered ``"[a,b]"`` with commas stripped from string
  elements (miw/log_record.cc:700-738).

Everything is built-in column expressions over the aggregated
DataFrame — the rendering is a narrow map stage, no extra shuffle.

Documented divergences (deterministic stand-ins for the reference's
merge-order-dependent output, see operators/aggregate.py:10-39):
union values are sorted (insertion order in the reference);
union_count histograms are sorted by value (hash order); non-aggregated
fields keep the minimum (first-merged in the reference); JSON double
formatting is Spark/Jackson's shortest-repr (jsoncpp %.17g).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.functions.cols import qcol
from cybersecurity_miw_spark.operators.aggregate import LOGS_COL, order_final
from cybersecurity_miw_spark.plans.logdef import LogDef


def _strip_brackets(j: Column) -> Column:
    """'[x]' → 'x' — turns a one-element to_json array rendering into
    the scalar's JSON rendering (correct escaping for free)."""
    return j.substr(F.lit(2), F.length(j) - 2)


def _json_scalar(v: Column) -> Column:
    """JSON rendering of any scalar column (string escaping, number and
    bool formats all via to_json)."""
    return _strip_brackets(F.to_json(F.array(v)))


def _json_array_or_scalar(arr: Column) -> Column:
    """scalar-if-1 / array-if-more (miw/log_record.cc:540-560)."""
    j = F.to_json(arr)
    return F.when(F.size(arr) == 1, _strip_brackets(j)).otherwise(j)


def _g6(v: Column) -> Column:
    """C++ ``ostream << double`` default formatting: 6 significant
    digits with trailing zeros removed (C's %g). Java's %g keeps the
    zeros, so trim them after formatting."""
    s = F.format_string("%g", v)
    s = F.regexp_replace(s, r"(\.\d*?)0+(e|$)", r"$1$2")
    return F.regexp_replace(s, r"\.(e|$)", r"$1")


def _csv_scalar(v: Column, dtype: str) -> Column:
    if dtype == "string":
        return F.concat(F.lit('"'), v, F.lit('"'))
    if dtype == "boolean":
        return v.cast("int").cast("string")
    if dtype in ("double", "float"):
        return _g6(v)
    return v.cast("string")


def _csv_element(x: Column, eltype: str) -> Column:
    """Array-element rendering: strings lose commas, no quoting
    (miw/log_record.cc:718-726)."""
    if eltype == "string":
        return F.replace(x, F.lit(","), F.lit(""))
    if eltype in ("double", "float"):
        return _g6(x)
    if eltype == "boolean":
        return x.cast("int").cast("string")
    return x.cast("string")


def _csv_array_or_scalar(arr: Column, eltype: str) -> Column:
    rendered = F.concat(
        F.lit('"['),
        F.concat_ws(",", F.transform(arr, lambda x: _csv_element(x, eltype))),
        F.lit(']"'),
    )
    return F.when(
        F.size(arr) == 1,
        _csv_scalar(F.get(arr, 0), eltype),
    ).otherwise(rendered)


def _element_type(dtype: str) -> str:
    """'array<string>' → 'string'."""
    return dtype[len("array<") : -1] if dtype.startswith("array<") else dtype


def _fragments(df: DataFrame, ldef: LogDef) -> list[tuple[str, Column, Column]]:
    """(key, json_fragment, csv_fragment) per output key; fragments are
    NULL when the key is omitted for that row (concat_ws drops them so
    the rendered object matches the reference's per-record key set)."""
    dtypes = dict(df.dtypes)
    out: list[tuple[str, Column, Column]] = []
    seen: set[str] = set()

    def emit(key: str, v: Column, dtype: str, gate: Column | None = None) -> None:
        if key in seen:  # jsoncpp's map keeps one entry per key
            return
        seen.add(key)
        if dtype.startswith("array<"):
            jf = _json_array_or_scalar(v)
            cf = _csv_array_or_scalar(v, _element_type(dtype))
            present = v.isNotNull() & (F.size(v) > 0)
        else:
            jf = _json_scalar(v)
            cf = _csv_scalar(v, dtype)
            present = v.isNotNull()
        if gate is not None:
            present = present & gate
        out.append(
            (
                key,
                F.when(present, F.concat(F.lit(f'"{key}":'), jf)),
                F.when(present, cf),
            )
        )

    for f in ldef.fields:
        if f.preprocessing == "microsoftdnslogs":
            # the declared field is skipped at output; its decode is
            # emitted as the dynamic field "target"
            # (miw/log_format.cc:709-715). Several DNS fields collapse
            # to one key, as jsoncpp's map would.
            if f.name in dtypes and not any(
                g.name == "target" for g in ldef.fields
            ):
                emit("target", qcol(f.name), dtypes[f.name])
            continue
        if f.preprocessing:
            # skipped; dynamic (from_kv) fields carry the payload
            # (miw/log_record.cc:495-496)
            continue
        if f.aggregation == "count":
            col = f"{f.name}_count"
            emit(col, qcol(col), dtypes[col], gate=qcol(col) > 1)
        elif f.aggregation == "union_count":
            col = f"{f.name}_counts"
            emit(f.name, F.map_keys(qcol(col)), f"array<{_vtype(dtypes[col])[0]}>")
            emit(
                f"{f.name}_count",
                F.map_values(qcol(col)),
                f"array<{_vtype(dtypes[col])[1]}>",
            )
        elif f.name in dtypes:
            emit(f.name, qcol(f.name), dtypes[f.name])

    # dynamic (kv-derived) columns not declared in the format: emitted
    # like plain fields, as the reference appends them to the record's
    # ldef (miw/log_format.cc:570-576)
    declared = {f.name for f in ldef.fields} | {
        f"{f.name}_count" for f in ldef.fields
    } | {f"{f.name}_counts" for f in ldef.fields}
    meta = {"id", LOGS_COL, "format_name", "appname", "std_date_dt", "content"}
    for name, dtype in df.dtypes:
        if name.startswith("_"):  # engine internals (_file, _raw)
            continue
        if name not in declared and name not in meta:
            emit(name, qcol(name), dtype)

    emit("id", F.col("id"), "string")
    emit(LOGS_COL, F.col(LOGS_COL), "bigint")
    emit("format_name", F.col("format_name"), "string")
    if "appname" in dtypes:
        emit("appname", F.col("appname"), "string")
    emit("std_date_dt", F.col("std_date_dt"), "string")

    out.sort(key=lambda t: t[0])
    return out


def _vtype(map_dtype: str) -> tuple[str, str]:
    """'map<string,bigint>' → ('string', 'bigint')."""
    inner = map_dtype[len("map<") : -1]
    k, _, v = inner.partition(",")
    return k.strip(), v.strip()


def json_lines(df: DataFrame, ldef: LogDef) -> DataFrame:
    """Aggregated+finalized result → one reference-shape JSON object
    per line (column ``value``), keys alphabetical. With stored raw
    content (``-store_content``), each group is followed by the
    reference's companion record
    ``{"content":{"add":<lines>},"id":"<id>_content","original_size":N}``
    (miw/mr_job.cc:135-143; keys alphabetical like jsoncpp's map)."""
    from cybersecurity_miw_spark.sources.sinks import finalize

    fin = finalize(df, ldef)
    frags = _fragments(fin, ldef)
    line = F.concat(
        F.lit("{"), F.concat_ws(",", *[j for _, j, _ in frags]), F.lit("}")
    )
    if "content" in fin.columns:
        # flatten_lines: each line + "\n" (miw/log_record.cc:326-335)
        joined = F.concat(F.concat_ws("\n", F.col("content")), F.lit("\n"))
        companion = F.to_json(
            F.struct(
                F.struct(joined.alias("add")).alias("content"),
                F.concat(F.col("id"), F.lit("_content")).alias("id"),
                F.octet_length(joined).alias("original_size"),
            )
        )
        line = F.when(
            F.size(F.col("content")) > 0,
            F.concat(line, F.lit("\n"), companion),
        ).otherwise(line)
    return fin.select(line.alias("value"))


def csv_lines(df: DataFrame, ldef: LogDef) -> DataFrame:
    """Reference-shape CSV data lines (no header), columns alphabetical
    (jsoncpp map iteration order, miw/log_record.cc:686-699)."""
    from cybersecurity_miw_spark.sources.sinks import finalize

    fin = finalize(df, ldef)
    frags = _fragments(fin, ldef)
    line = F.concat_ws(",", *[c for _, _, c in frags])
    return fin.select(line.alias("value"))


def csv_header(df: DataFrame, ldef: LogDef) -> str:
    """The header line: every key the format can emit, alphabetical.
    (The reference takes the FIRST record's key set,
    miw/log_record.cc:690-697 — identical whenever row one has all
    fields present; the full set is the deterministic choice.)"""
    from cybersecurity_miw_spark.sources.sinks import finalize

    fin = finalize(df, ldef)
    return ",".join(k for k, _, _ in _fragments(fin, ldef))


def write_json_parity(
    df: DataFrame,
    ldef: LogDef,
    path: str,
    mode: str = "overwrite",
    codec: str | None = None,
) -> None:
    """S11 JSON-lines sink, reference shape (miw/mr_job.cc:118-145)."""
    w = json_lines(df, ldef).write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    w.text(path)


def write_csv_parity(
    df: DataFrame,
    ldef: LogDef,
    path: str,
    mode: str = "overwrite",
    codec: str | None = None,
) -> None:
    """S12 CSV sink, reference shape. Header is not written (Spark text
    files are partition-parallel); use :func:`csv_header` to prepend it
    when assembling a single file."""
    w = csv_lines(df, ldef).write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    w.text(path)
