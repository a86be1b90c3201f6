"""TableMetadata -> property-graph nodes/relations (SURVEY.md §2.C C2).

The reference's loader flattens each nested TableMetadata record into graph
node + relationship CSV rows with deterministic URI-style keys (loader
imported at job/sample_mysql_aws_sqs_job.py:9; the LABEL/KEY column contract
declared at publisher/aws_sqs_csv_puiblisher.py:43-51; key shape
``{database}://{cluster}.{schema}/{table}[/{column}]``).

Here the flattening is a pure DataFrame plan: ``explode`` the columns array,
synthesize keys with ``concat_ws``/``concat``, union per-label frames by
name.  Properties are really typed (sort_order int, is_view boolean) —
the reference's ``:UNQUOTED`` CSV-header typing hack is only re-created in
the legacy CSV writer (sinks/staging.py), never in the engine.

Node labels: Table, Column, Description.  Description nodes exist only for
non-empty descriptions, keyed ``<parent_key>/_description`` — matching the
Databuilder graph shape (SURVEY.md §1.1b).

Relations (FIXTURES.md B4): Table-[COLUMN/COLUMN_OF]->Column and
parent-[DESCRIPTION/DESCRIPTION_OF]->Description.

Scale note: both outputs derive from one exploded frame; Catalyst reuses the
scan, there is no shuffle at all (narrow ops only), and key synthesis is
whole-stage-codegen string concat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.observability import capture_plan_segment
from ab_metadata_pusher_spark.operators._shared import nodeset_hint

__all__ = [
    "table_key", "column_key", "to_nodes", "to_relations",
    "NODE_COLUMNS", "RELATION_COLUMNS", "pagerank",
]

NODE_COLUMNS = ("label", "key", "name", "description", "col_type",
                "sort_order", "is_view")
RELATION_COLUMNS = ("start_label", "start_key", "end_label", "end_key",
                    "type", "reverse_type")


def table_key(database: Column | str = "database",
              cluster: Column | str = "cluster",
              schema: Column | str = "schema",
              table: Column | str = "table_name") -> Column:
    """``{database}://{cluster}.{schema}/{table}`` (SURVEY.md §1.1b)."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return F.concat(c(database), F.lit("://"), c(cluster), F.lit("."),
                    c(schema), F.lit("/"), c(table))


def column_key(table_key_col: Column, col_name: Column) -> Column:
    return F.concat(table_key_col, F.lit("/"), col_name)


def _exploded(tm: DataFrame) -> DataFrame:
    """One row per column with table context + both keys, computed once."""
    tkey = table_key().alias("table_key")
    return (
        tm.select("database", "cluster", "schema", "table_name",
                  F.col("description").alias("table_description"),
                  "is_view", tkey,
                  F.explode("columns").alias("col"))
        .select("*",
                column_key(F.col("table_key"), F.col("col.name")).alias("col_key"))
    )


def _node(df: DataFrame, label: str, key: Column, name: Column,
          description: Column, col_type: Column | None = None,
          sort_order: Column | None = None,
          is_view: Column | None = None) -> DataFrame:
    return df.select(
        F.lit(label).alias("label"),
        key.alias("key"),
        name.alias("name"),
        description.alias("description"),
        (col_type if col_type is not None
         else F.lit(None).cast("string")).alias("col_type"),
        (sort_order if sort_order is not None
         else F.lit(None).cast("int")).alias("sort_order"),
        (is_view if is_view is not None
         else F.lit(None).cast("boolean")).alias("is_view"),
    )


def to_nodes(tm: DataFrame) -> DataFrame:
    """All graph nodes as one typed DataFrame (FIXTURES.md B3)."""
    ex = _exploded(tm)

    tables = tm.select("database", "cluster", "schema", "table_name",
                       "description", "is_view", table_key().alias("key"))
    table_nodes = _node(
        tables.drop_duplicates(["key"]), "Table",
        F.col("key"), F.col("table_name"), F.col("description"),
        is_view=F.col("is_view"))

    column_nodes = _node(
        ex, "Column",
        F.col("col_key"), F.col("col.name"), F.col("col.description"),
        col_type=F.col("col.col_type"), sort_order=F.col("col.sort_order"))

    table_desc_nodes = _node(
        tables.filter(F.col("description") != ""), "Description",
        F.concat(F.col("key"), F.lit("/_description")),
        F.lit("_description"), F.col("description"))

    col_desc_nodes = _node(
        ex.filter(F.col("col.description") != ""), "Description",
        F.concat(F.col("col_key"), F.lit("/_description")),
        F.lit("_description"), F.col("col.description"))

    return (table_nodes
            .unionByName(column_nodes)
            .unionByName(table_desc_nodes)
            .unionByName(col_desc_nodes))


def _relation(df: DataFrame, start_label: str, start_key: Column,
              end_label: str, end_key: Column,
              rel_type: str, reverse_type: str) -> DataFrame:
    return df.select(
        F.lit(start_label).alias("start_label"),
        start_key.alias("start_key"),
        F.lit(end_label).alias("end_label"),
        end_key.alias("end_key"),
        F.lit(rel_type).alias("type"),
        F.lit(reverse_type).alias("reverse_type"),
    )


def to_relations(tm: DataFrame) -> DataFrame:
    """All graph relationships as one DataFrame (FIXTURES.md B4)."""
    ex = _exploded(tm)

    table_column = _relation(
        ex, "Table", F.col("table_key"), "Column", F.col("col_key"),
        "COLUMN", "COLUMN_OF")

    table_desc = _relation(
        ex.select("table_key", "table_description").drop_duplicates(["table_key"])
          .filter(F.col("table_description") != ""),
        "Table", F.col("table_key"),
        "Description", F.concat(F.col("table_key"), F.lit("/_description")),
        "DESCRIPTION", "DESCRIPTION_OF")

    col_desc = _relation(
        ex.filter(F.col("col.description") != ""),
        "Column", F.col("col_key"),
        "Description", F.concat(F.col("col_key"), F.lit("/_description")),
        "DESCRIPTION", "DESCRIPTION_OF")

    return table_column.unionByName(table_desc).unionByName(col_desc)


def degrees(relations: DataFrame) -> DataFrame:
    """Per-node in/out degree over a relations frame (start_label,
    start_key, end_label, end_key, ...).

    Two map-side-combinable aggregations + a full-outer join on the node
    key: the shuffles carry (key, count) pairs only.  Degree profiling is
    the first sanity check on any generated property graph (e.g. a Table
    node's out-degree must equal its column count + description edges).
    """
    out_deg = (relations.groupBy(
        F.col("start_label").alias("label"), F.col("start_key").alias("node_key"))
        .agg(F.count(F.lit(1)).alias("out_deg")))
    in_deg = (relations.groupBy(
        F.col("end_label").alias("label"), F.col("end_key").alias("node_key"))
        .agg(F.count(F.lit(1)).alias("in_deg")))
    return (out_deg.join(in_deg, ["label", "node_key"], "full_outer")
            .select("label", "node_key",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg")))


def graph_components(relations: DataFrame) -> DataFrame:
    """Connected components of the relation graph, labelling every node
    with the lexicographically smallest key in its component.

    String keys are mapped to dense longs by a row_number over the sorted
    distinct key set, so min-label propagation (operators/dedup.py
    connected_components — the same loop the dedup clusters use) preserves
    "min key wins".  The id-assigning window is single-partition by
    design: the distinct NODE set of a metadata graph is catalog-sized,
    not corpus-sized.  For billion-node graphs swap the window for
    zipWithIndex-per-partition offsets; the propagation loop is unchanged.
    """
    from ab_metadata_pusher_spark.operators.dedup import connected_components
    from pyspark.sql import Window

    nodes = (relations.select(F.col("start_key").alias("node_key"))
             .unionByName(relations.select(F.col("end_key").alias("node_key")))
             .distinct())
    id_map = nodes.withColumn(
        "id", F.row_number().over(Window.orderBy("node_key")).cast("bigint"))
    # id_map feeds the edge build (twice), the vertex set, and the final
    # label->key joins; without the cache every consumer replays the
    # upstream graph build + the id-assigning sort.
    id_map.persist()
    edges = (relations
             .join(id_map.select(F.col("node_key").alias("start_key"),
                                 F.col("id").alias("src")), "start_key")
             .join(id_map.select(F.col("node_key").alias("end_key"),
                                 F.col("id").alias("dst")), "end_key")
             .select("src", "dst"))
    # metadata graphs are catalog-sized: a handful of shuffle partitions
    # beats CPU-count near-empty ones for the propagation loop
    labels = connected_components(id_map.select("id"), edges,
                                  shuffle_partitions=8)
    roots = id_map.select(F.col("id").alias("label"),
                          F.col("node_key").alias("component_key"))
    # id_map stays persisted: the returned plan still reads it twice and
    # unpersisting here would evict the cache before execution.  The
    # frame is node-count-sized; callers that loop over many graphs can
    # unpersist after materializing.
    return (id_map.join(labels, "id").join(roots, "label")
            .select("node_key", "component_key"))


def pagerank(relations: DataFrame, iters: int = 3,
             damping: float = 0.85,
             broadcast_ranks: bool | None = None,
             checkpoint_every: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over a relations frame (start_key ->
    end_key directed edges): ``pr'(v) = (1-d)/N + d * sum_{u->v}
    pr(u)/out_deg(u)``, starting uniform at 1/N.  Dangling-node mass
    (Description nodes have no out-edges) intentionally leaks — the
    contract is the plain power-iteration step, identical on any engine,
    so a fixed iteration count is exactly reproducible.

    Each iteration is ONE shuffle: join current ranks to the out-degree-
    annotated edge list (reused across iterations, so it is persisted)
    and re-aggregate by destination; the left join back to the vertex
    set keeps zero-in-degree nodes at the teleport floor.  N comes from
    a driver-side count — the vertex set of a metadata graph is
    catalog-sized.

    ``broadcast_ranks`` hints the rank/contribution side of every join:
    a metadata graph's vertex frame is KB-sized, and the hint turns 3
    iterations of sort-merge-join chains into map-side broadcast joins
    against the one persisted edge list.  The default (``None``) decides
    from the vertex count the uniform-rank seed already pays for, under
    the shared node-set budget (``operators/_shared.nodeset_hint`` —
    the LPA/k-core/BFS resource rule): web-scale rank frames no longer
    fit one executor and flip to the shuffled form automatically; pass
    True/False to override.  Lineage is truncated with
    ``localCheckpoint`` every ``checkpoint_every`` iterations either
    way.
    """
    edges = relations.select(F.col("start_key").alias("src"),
                             F.col("end_key").alias("dst"))
    nodes = (edges.select(F.col("src").alias("node_key"))
             .unionByName(edges.select(F.col("dst").alias("node_key")))
             .distinct())
    nodes.persist()
    n = nodes.count()
    if broadcast_ranks is None:
        # string-keyed (node_key, double) rank rows: ~64 B with slack
        hint = nodeset_hint(n, 64)
    else:
        hint = F.broadcast if broadcast_ranks else (lambda df: df)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e = edges.join(hint(out_deg), "src").persist()
    teleport = F.lit((1.0 - damping) / n)
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iters):
        contribs = (e.join(hint(pr), e.src == pr.node_key)
                    .select(F.col("dst").alias("node_key"),
                            (F.col("pr") / F.col("out_deg")).alias("c"))
                    .groupBy("node_key")
                    .agg(F.sum("c").alias("in_mass")))
        pr = (nodes.join(hint(contribs), "node_key", "left")
              .select("node_key",
                      (teleport + F.lit(damping)
                       * F.coalesce("in_mass", F.lit(0.0))).alias("pr")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # Bound plan lineage: each unrolled iteration otherwise nests
            # the previous plan, and optimizer time grows superlinearly
            # with iteration count.  Values are unchanged.
            capture_plan_segment(pr)
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node_key", F.round("pr", 6).alias("pagerank"))
