"""`jsonql`-style ad-hoc CLI — the reference's second entry point
(``cc_net/jsonql.py:1338-1340``, parser at ``:81-150``), re-expressed as
DataFrame plans so Catalyst owns pushdown/pruning.

Usage (mirrors the reference's ``--``-separated pipeline groups,
``cc_net/jsonql.py:153-183``):

    python -m cc_net_spark.jsonql_cli \
        where '{lang}=="en"' -- select doc_id n_chars \
        --file in.parquet --output out.parquet

Commands (reference: select|where|merge|describe|split|shard):

* ``select f1 f2 ...``      column projection (``jsonql.py:585-605``)
* ``where EXPR``            filter; the reference's ``{field}`` expression
                            language (``jsonql.py:602-618`` compiles it to
                            an eval'd lambda) is translated to a Spark SQL
                            predicate — declarative instead of eval
* ``describe [f1 f2 ...]``  per-column profile (``jsonql.py:840-884``)
* ``split FIELD``           route rows into one output per field value
                            (``jsonql.py:885-937``) via partitionBy
* ``shard N``               repartition into N output files

I/O: ``.jsonl``/``.json``/``.jsonl.gz`` via the lenient reader
(``sources/jsonl.py``), anything else as Parquet. The reference's
``processes=N`` flag has no analogue — parallelism is the cluster's.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_JSON_EXTS = (".jsonl", ".json", ".jsonl.gz", ".json.gz")


def translate_expr(expr: str) -> str:
    """Translate the reference's ``{field}`` mini-language into a Spark
    SQL predicate: ``{lang}=="en" and {n_chars}>=100`` ->
    ``(`lang`) = ("en") AND (`n_chars`) >= (100)``.

    Supported (the clause forms the reference's docs/tests use,
    ``cc_net/jsonql.py:600-618,624``): field refs ``{name}`` (dots access
    nested struct fields: ``{meta.score}`` becomes `` `meta`.`score` ``),
    comparison operators, chained and/or/not, ``in``/``not in`` with
    python list literals (``{lang} in ['en','de']`` -> ``IN ('en','de')``),
    arithmetic, ``is [not] None`` -> ``IS [NOT] NULL``, python
    ``True/False/None`` literals, ``len(...)`` -> ``length(...)`` (the
    ``jsonql where 'len({text}) > 100'`` doc example), and the
    ``--requires random`` sampling idiom ``random.random()`` ->
    ``rand()``. Rewrites apply OUTSIDE string literals only (a literal
    like ``"a==b"`` passes through untouched). Anything else is handed
    to Spark SQL as-is — an invalid expression fails analysis loudly
    instead of being eval'd; arbitrary ``--requires`` python imports
    have no SQL analogue by design (declarative plans can't eval)."""
    import re

    def field_ref(m: re.Match) -> str:
        # each dotted segment quoted separately: {meta.score} must resolve
        # the nested struct field, not a top-level column named "meta.score"
        return ".".join(f"`{p}`" for p in m.group(1).split("."))

    # ALL rewrites — including {field} refs — apply only OUTSIDE quoted
    # string literals: a literal like '{0}' or "a==b" passes through
    # untouched (the reference's compile_expr f-string shows the same
    # behavior only for the expression text, never inside its literals)
    parts = re.split(r"(\"[^\"]*\"|'[^']*')", expr)
    for i in range(0, len(parts), 2):  # even indices = outside literals
        p = re.sub(r"\{([A-Za-z0-9_.]+)\}", field_ref, parts[i])
        p = re.sub(r"(?<![<>!=])==", "=", p).replace("!=", "<>")
        # null tests and literals (the compile_expr lambda sees python
        # None/True/False; Spark SQL wants NULL/true/false). Equality
        # with None must become IS [NOT] NULL: a literal `= NULL`
        # evaluates to NULL for EVERY row — silently zero matches —
        # whereas the reference's python `== None` matches nulls.
        p = re.sub(r"\bis\s+not\s+None\b", "IS NOT NULL", p)
        p = re.sub(r"\bis\s+None\b", "IS NULL", p)
        p = re.sub(r"(?<![<>!=])\s*=\s*None\b", " IS NULL", p)
        p = re.sub(r"\s*<>\s*None\b", " IS NOT NULL", p)
        p = re.sub(r"\bNone\b", "NULL", p)
        p = re.sub(r"\bTrue\b", "true", p)
        p = re.sub(r"\bFalse\b", "false", p)
        # the builtins the reference's docs actually use: len() (the
        # `jsonql where 'len({text}) > 100'` doc example) and the
        # --requires random-sampling idiom random.random()
        p = re.sub(r"\blen\(", "length(", p)
        p = re.sub(r"\brandom\.random\(\)", "rand()", p)
        parts[i] = p
    # python membership lists -> SQL IN lists. The list's string elements
    # sit in the ODD (literal) parts, so the bracket pair spans parts: a
    # tiny state machine opens at `in [` and closes at the next `]` in a
    # NON-literal part — brackets inside string literals stay untouched.
    in_list = False
    for i in range(0, len(parts), 2):
        p, done = parts[i], ""
        while True:
            if not in_list:
                m = re.search(r"(?i)\b(not\s+in|in)\s*\[", p)
                if not m:
                    break
                done += p[: m.start()] + m.group(1) + " ("
                p = p[m.end():]
                in_list = True
            else:
                j = p.find("]")
                if j < 0:
                    break
                done += p[:j] + ")"
                p = p[j + 1:]
                in_list = False
        parts[i] = done + p
    return "".join(parts)


def _read(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(_JSON_EXTS):
        from cc_net_spark.sources.jsonl import read_jsonl

        clean, _metrics = read_jsonl(spark, path)
        return clean
    return spark.read.parquet(path)


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    fmt = "json" if path.endswith(_JSON_EXTS) else "parquet"
    if partition_by:
        from cc_net_spark.sources.sinks import write_partitioned

        write_partitioned(df, path, partition_by, fmt=fmt)
    elif fmt == "json":
        from cc_net_spark.sources.sinks import write_jsonl

        write_jsonl(df, path)
    else:
        df.write.mode("overwrite").parquet(path)


def _split_groups(argv: list[str]) -> list[list[str]]:
    """Split argv on standalone ``--`` (``cc_net/jsonql.py:153-161``)."""
    groups: list[list[str]] = [[]]
    for a in argv:
        if a == "--":
            groups.append([])
        else:
            groups[-1].append(a)
    return [g for g in groups if g]


def describe(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: n_present / n_distinct / total chars (the
    jsonql `describe` shape, ``cc_net/jsonql.py:840-884``).

    ONE aggregation over ONE scan (Catalyst plans the multiple distinct
    aggregates via Expand) — a per-column agg+union would scan the source
    once per column — then the single wide row is pivoted back to one row
    per column with an explode of literal structs."""
    cols = cols or df.columns
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_p{i}"),
            F.countDistinct(F.col(c)).alias(f"_d{i}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"_t{i}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_p{i}").alias("n_present"),
                F.col(f"_d{i}").alias("n_distinct"),
                F.col(f"_t{i}").alias("total_chars"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select("_r.*")


def describe_labels(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    top: int = 100,
    floor: int = 5,
    max_label_len: int = 100,
) -> DataFrame:
    """Top-N label value counts per string column — the `describe` label
    output (``cc_net/jsonql.py:829-838`` ``display_stats`` top-100 with
    the n >= 5 floor; values collected at ``jsonql.py:858-864``). Values
    longer than ``MAX_LABEL_LEN`` (100) are not labels, exactly as the
    reference skips them per value. The reference also caps its counter
    dict at 1000 distinct labels — a pure streaming-memory bound that a
    groupBy does not need (and which made its counts order-dependent).

    One scan: (column, label) pairs exploded from literal structs, one
    groupBy, a per-column top-N window. ``ratio`` = n / n_present of the
    column (the percentage ``display_stats`` prints). Ties at the top-N
    cutoff break deterministically by label asc."""
    from pyspark.sql.types import StringType

    by_name = {f.name: f.dataType for f in df.schema}
    if cols is not None:
        # an explicitly requested column that is missing or non-string
        # must fail loudly — silently profiling a subset would let a
        # typo masquerade as "no labels found"
        bad = [
            c for c in cols
            if not isinstance(by_name.get(c), StringType)
        ]
        if bad:
            raise ValueError(
                f"describe_labels: not string columns of the input: {bad}"
            )
    str_cols = [
        n for n, t in by_name.items()
        if isinstance(t, StringType) and (cols is None or n in cols)
    ]
    if not str_cols:
        raise ValueError("no string columns to count labels over")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column"), F.col(c).alias("label"))
                    for c in str_cols
                ]
            )
        ).alias("_p")
    ).select("_p.*")
    present = pairs.filter(F.col("label").isNotNull())
    n_present = present.groupBy("column").agg(F.count(F.lit(1)).alias("_np"))
    counted = (
        present.filter(F.length("label") <= max_label_len)
        .groupBy("column", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(F.desc("n"), F.asc("label"))
    return (
        counted.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") <= top) & (F.col("n") >= floor))
        .join(n_present, "column")
        .select(
            "column",
            "label",
            "n",
            F.round(F.col("n") / F.col("_np"), 6).alias("ratio"),
        )
    )


def histogram_df(
    df: DataFrame,
    value_col: str,
    *,
    bins: int = 10,
    weight_col: str | None = None,
    cumulative: bool = False,
) -> DataFrame:
    """np.histogram-compatible fixed-count histogram — the `describe`
    numeric profile (``cc_net/jsonql.py:748-766`` ``histogram`` +
    ``display_stats`` weighted/cumulative options, ``jsonql.py:801-826``):
    ``bins`` uniform buckets over [min, max], rightmost edge inclusive,
    EMPTY buckets emitted as zero rows. Bucket index uses numpy's
    ``(v - lo) * bins / (hi - lo)`` rounding (verified bit-identical on
    the reference's own test vectors). With a weight column the bin
    edges still come from the values alone, then weights are summed per
    bin — the reference's exact two-step. ``cumulative`` running-sums
    the counts (``display_stats(cumulative=True)``).

    Returns (bucket, bin_lo, bin_hi, n); n is double (weight sums).
    One pass for the edges (min/max agg) + one for the counts."""
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    lohi = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
    if lohi["lo"] is None:  # empty input or all-null column
        return spark.createDataFrame(
            [], "bucket int, bin_lo double, bin_hi double, n double"
        )
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    if hi == lo:  # np.histogram's degenerate-range rule
        lo, hi = lo - 0.5, hi + 0.5
    idx = F.least(
        F.floor((v - F.lit(lo)) * F.lit(float(bins)) / F.lit(hi - lo)).cast("int"),
        F.lit(bins - 1),
    )
    wcol = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    grouped = (
        df.select(idx.alias("bucket"), wcol.alias("_w"))
        .groupBy("bucket")
        .agg(F.sum("_w").alias("n"))
    )
    width = (hi - lo) / bins
    full = (
        spark.range(bins)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(grouped, "bucket", "left")
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias(
                "bin_hi"
            ),
            F.coalesce("n", F.lit(0.0)).alias("n"),
        )
    )
    if cumulative:
        cw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        full = full.withColumn("n", F.sum("n").over(cw))
    return full.withColumn("n", F.round("n", 6))


def apply_command(df: DataFrame, cmd: list[str]):
    """-> (df, partition_by | None). One reference pipe group."""
    verb, args = cmd[0], cmd[1:]
    if verb == "select":
        return df.select(*args), None
    if verb == "where":
        if len(args) != 1:
            raise SystemExit("where takes exactly one expression")
        return df.filter(F.expr(translate_expr(args[0]))), None
    if verb == "describe":
        return describe(df, args or None), None
    if verb == "labels":
        return describe_labels(df, args or None), None
    if verb == "histogram":
        # histogram COL [bins=N] [weights=COL] [cumulative]
        if not args:
            raise SystemExit("histogram takes a value column")
        kw: dict = {}
        for a in args[1:]:
            if a == "cumulative":
                kw["cumulative"] = True
            elif a.startswith("bins="):
                kw["bins"] = int(a[5:])
            elif a.startswith("weights="):
                kw["weight_col"] = a[8:]
            else:
                raise SystemExit(f"histogram: unknown option {a}")
        return histogram_df(df, args[0], **kw), None
    if verb == "split":
        if len(args) != 1:
            raise SystemExit("split takes exactly one field")
        return df, [args[0]]
    if verb == "shard":
        if len(args) != 1:
            raise SystemExit("shard takes exactly one partition count")
        return df.repartition(int(args[0])), None
    raise SystemExit(
        f"unknown command: {verb} "
        "(select|where|describe|labels|histogram|split|shard)"
    )


def run(
    spark: SparkSession,
    argv: list[str],
    df: DataFrame | None = None,
) -> tuple[DataFrame, str | None, list[str] | None]:
    """Parse + build the plan. Returns (df, output_path, partition_by).
    Exposed for tests; ``main`` executes the write/show."""
    file_path = output = None
    flat: list[str] = []
    it = iter(argv)
    for a in it:
        if a in ("--file", "--output"):
            try:
                val = next(it)
            except StopIteration:
                raise SystemExit(f"{a} requires a value") from None
            if a == "--file":
                file_path = val
            else:
                output = val
        else:
            flat.append(a)
    if df is None:
        if not file_path:
            raise SystemExit("--file is required")
        df = _read(spark, file_path)
    partition_by = None
    for group in _split_groups(flat):
        df, pb = apply_command(df, group)
        partition_by = pb or partition_by
    return df, output, partition_by


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    from cc_net_spark.session import get_spark

    spark = get_spark(app_name="cc_net_spark_jsonql")
    df, output, partition_by = run(spark, argv)
    if output:
        _write(df, output, partition_by)
    else:
        df.show(50, truncate=False)


if __name__ == "__main__":
    main()
