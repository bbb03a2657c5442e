"""Text edge-list reader — reference A1/A2
(``TCR/src/type/Graph.py:192-210`` + ``CSRGraph.py:404-487``).

Reference semantics reproduced:

- whitespace-separated integer endpoints per line (``np.loadtxt``), comment
  lines skipped (SNAP-style ``#`` prefix) — ``Graph.py:196-199``;
- extra numeric columns become edge attributes (``Graph.py:202-206``): the
  first is named ``weight`` (what SSSP consumes), further ones ``attr2..``;
- the vertex set is the sorted unique endpoints and ids are densified to
  ``0..V-1`` in ascending original-id order when ``densify=True``
  (``CSRGraph.py:432-441`` ``vertex_to_index``);
- undirected graphs are symmetrized and deduped at build time
  (``CSRGraph.py:452-461``), self-loops dropped
  (``KCoreGPU-master/.../src/graph.cpp:87-101``).

The reference lexsorts edges by (src, dst) (``Graph.py:200``); under
DataFrame set semantics order is meaningless, so no sort is performed —
callers sort on output when they need it.

Spark-first: one ``spark.read.text`` scan + JVM-side split/cast (no Python
in the scan path), so a 100 TB edge list parallelizes by file split.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tcr_kcore_spark.graph import LinkGraph


def read_edgelist(
    spark: SparkSession,
    path: str,
    comment: str = "#",
    directed: bool = True,
    densify: bool = False,
    n_attrs: int | None = None,
    probe_rows: int | None = None,
):
    """Read a text edge list into a LinkGraph.

    ``n_attrs``: number of extra attribute columns to keep.  ``None``
    autodetects under a UNIFORM-WIDTH assumption, validated with one
    aggregate scan (``min(size) == max(size)``) that fails loudly on
    ragged input — a first()-based probe would be partition-order
    dependent and would turn short lines into silent nulls.

    COST: the autodetect validation is a SECOND complete pass over the
    input before the real read.  Large-scale callers should pass
    ``n_attrs`` explicitly (no probe at all; short lines then yield nulls
    in the missing attribute columns, by contract), or set ``probe_rows``
    to bound the probe to the first N data lines (limit-pushed, reads only
    enough splits) — trading the loud whole-file ragged check for a
    sampled one.

    Returns ``LinkGraph`` or, when ``densify=True``,
    ``(LinkGraph, id_map)`` with ``id_map = (orig, id)``.
    """
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    data = lines.where(
        (F.length("line") > 0) & ~F.col("line").startswith(comment)
    ).select(F.split("line", r"\s+").alias("f"))

    if n_attrs is None:
        probe = data if probe_rows is None else data.limit(int(probe_rows))
        row = probe.agg(
            F.min(F.size("f")).alias("lo"), F.max(F.size("f")).alias("hi")
        ).first()
        if row is None or row["lo"] is None:
            n_attrs = 0
        elif row["lo"] != row["hi"]:
            raise ValueError(
                f"ragged edge list {path!r}: line widths range "
                f"{row['lo']}..{row['hi']}; pass n_attrs explicitly"
            )
        else:
            n_attrs = max(int(row["lo"]) - 2, 0)

    # try_element_at, not element_at: under ANSI mode (Spark 4 default) a
    # short line would THROW instead of honoring the documented
    # "missing attributes yield nulls" contract for explicit/probed widths
    cols = [
        F.try_element_at("f", F.lit(1)).cast("long").alias("src"),
        F.try_element_at("f", F.lit(2)).cast("long").alias("dst"),
    ]
    for i in range(n_attrs):
        name = "weight" if i == 0 else f"attr{i + 1}"
        cols.append(F.try_element_at("f", F.lit(i + 3)).cast("double").alias(name))
    edges = data.select(*cols).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )

    g = LinkGraph.from_edges(edges, directed=directed)
    if not densify:
        return g
    dense, id_map = g.densify()
    return dense, id_map
