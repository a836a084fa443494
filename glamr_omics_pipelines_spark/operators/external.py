"""External-tool escape hatch + skew utilities (SURVEY §2.11, §4).

``pipe_tool`` is the Spark analog of the reference's ~60 shell-out rules
(fastp Snakefile:544-573, kraken2 1811-1831, coverm 1663-1669, …): stream a
DataFrame's rows through an external command line, one process per
partition, and parse the tool's TSV stdout back into a typed DataFrame.
Relational tool semantics should be reimplemented natively (SURVEY §2.11 —
counting/filtering/coverage live in operators/); this hatch is for genuinely
non-relational executables (aligners, assemblers) whose I/O is tabular.

``salted_join`` is the manual skew treatment (SURVEY §4): when one hot key
dominates a fact⨝fact join and AQE's skew split isn't available (e.g. the
join feeds a window), explode the small side K ways and scatter the large
side's hot rows uniformly across the K replicas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def pipe_tool(df: DataFrame, command: str, out_schema: StructType,
              sep: str = "\t") -> DataFrame:
    """Rows → stdin lines → ``command`` (per partition) → stdout lines → rows.

    Scale shape: one external process per partition, streaming both ways
    (RDD.pipe), so tool memory is per-partition-bounded and the fan-out is
    exactly the scan parallelism — the engine's version of one SLURM job per
    sample file.
    """
    spark = df.sparkSession
    n_cols = len(out_schema.fields)

    def to_line(row) -> str:
        return sep.join("" if v is None else str(v) for v in row)

    lines = df.rdd.map(to_line).pipe(command)
    parts = lines.map(lambda line: line.split(sep, n_cols - 1))

    def conform(xs: list) -> tuple:
        return tuple(xs + [None] * (n_cols - len(xs)))

    rows = parts.map(conform)
    # parse as strings first, then cast to the declared contract
    string_schema = ", ".join(f"`{f.name}` string" for f in out_schema.fields)
    raw = spark.createDataFrame(rows, string_schema)
    return raw.select(*[F.col(f.name).cast(f.dataType).alias(f.name)
                        for f in out_schema.fields])


def salted_join(large: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: replicate the small side ``salt`` ways, scatter
    the large side randomly across replicas, join on (key, salt).

    Use when a handful of hot keys (the dominant taxon / the control sample)
    would pin one reducer; cost = small side × salt, which must still fit
    the broadcast/shuffle budget."""
    salted_l = large.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt))).cast("int"))
    salted_s = small.withColumn(
        "_rep", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_l.join(
        salted_s, (salted_l[key] == salted_s[key])
        & (salted_l["_salt"] == salted_s["_rep"]), how)
    return out.drop(salted_s[key]).drop("_salt", "_rep")
