"""Incremental connected components over a persistent label store — the
clustering counterpart of dedup/incremental.py: merge each new batch of
near-dup edges into stored (node, component) labels WITHOUT re-running
connected components over the raw edge history.  Min-label CC is
order-free and associative, so ``add_batch(E1); add_batch(E2)`` is
exactly ``connected_components(E1 ∪ E2)`` for any batch split.

The trick is union-find over COMPONENT ids, not raw nodes: a batch's
endpoints resolve to their current component labels (a pruned point
lookup), the batch edges collapse to a component-level graph (≤ one node
per touched component — tiny relative to the corpus), min-label CC runs
on THAT graph, and the resulting old→new component remap is broadcast
back onto only the store partitions holding members of merged
components.  Closed components — the overwhelming majority at a steady
state — are never read, never recomputed, never rewritten.

Store layout (versioned snapshots, Iceberg-style commit without a
catalog):

* ``labels/``  (node, component), hash-partitioned by
  ``npart = pmod(xxhash64(node), P)``.  Point lookups of a batch's
  endpoints prune to the ≤ batch_size partitions their node hashes land
  in.  Because npart keys on the NODE, a relabel never moves a row
  across partitions — updates rewrite partitions in place.
* ``cindex/``  (component, npart) distinct pairs, hash-partitioned by
  ``cpart = pmod(xxhash64(component), P)`` — the inverted index that
  answers "which label partitions hold members of component c" without
  scanning labels.  A merge reads only the cparts of the merged
  components.

Each ``add_batch`` writes a NEW version directory containing freshly
written parquet for the touched partitions and hard-links (a metadata-
only constant-per-partition op; with a real table format this is the
manifest re-pointing Iceberg/Delta do natively) for the untouched ones,
then atomically bumps ``manifest.json``.  A crash mid-write leaves a
dangling un-referenced version dir; the committed version is unaffected.

Scale: per batch the work is O(batch) lookup + CC on the component graph
+ O(members-of-merged-components) rewrite.  The worst case — one giant
component absorbing others every batch — rewrites that component's rows
each time; that is inherent to maintaining materialized min-labels (the
alternative, rewriting labels lazily through the remap chain at read
time, trades it for unbounded read-side indirection).

Reference scope note: the reference engine has no graph/dedup layer;
this extends the pipeline the same way dedup/components.py does (public
algorithm: union-find / label propagation, Kiveris et al. 2014).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyg_timeseries_spark.dedup.components import connected_components


class ComponentStore:
    def __init__(self, path: str, spark: SparkSession, n_parts: int = 256,
                 gc_keep: int | None = 8):
        """``gc_keep``: snapshot versions retained; every ``add_batch``
        auto-gc's older version dirs (hard-linked files shared with
        retained versions survive — unlink only drops directory refs).
        ``None`` disables auto-gc for callers that pin old snapshots."""
        self.path = path
        self.spark = spark
        self.n_parts = n_parts
        self.gc_keep = gc_keep
        os.makedirs(path, exist_ok=True)
        self._manifest = os.path.join(path, "manifest.json")

    # -- snapshot plumbing ---------------------------------------------------
    def version(self) -> int:
        """Committed snapshot version; 0 = empty store."""
        if not os.path.exists(self._manifest):
            return 0
        with open(self._manifest) as f:
            return json.load(f)["version"]

    def _vdir(self, version: int, table: str) -> str:
        return os.path.join(self.path, f"v{version:06d}", table)

    def _commit(self, version: int) -> None:
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._manifest)

    def _hpart(self, col):
        return F.pmod(F.xxhash64(col.cast("string")), F.lit(self.n_parts))

    def _link_untouched(self, table: str, old_v: int, new_v: int,
                        pcol: str, touched: set[int]) -> None:
        """Hard-link every partition dir of ``old_v`` whose partition value
        is not in ``touched`` into the new version (metadata-only reuse —
        the local-FS stand-in for a table format's manifest re-point)."""
        src_root = self._vdir(old_v, table)
        dst_root = self._vdir(new_v, table)
        os.makedirs(dst_root, exist_ok=True)
        for entry in os.listdir(src_root):
            if not entry.startswith(f"{pcol}="):
                continue
            pval = int(entry.split("=", 1)[1])
            if pval in touched:
                continue
            src, dst = os.path.join(src_root, entry), os.path.join(dst_root, entry)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                os.link(os.path.join(src, fn), os.path.join(dst, fn))

    def labels(self, version: int | None = None,
               nparts: list[int] | None = None) -> DataFrame | None:
        """(node, component) at ``version`` (default: current), optionally
        pruned to ``nparts`` (partition filter)."""
        v = self.version() if version is None else version
        if v == 0:
            return None
        df = self.spark.read.parquet(self._vdir(v, "labels"))
        if nparts is not None:
            df = df.filter(F.col("npart").isin(nparts))
        return df.select("node", "component", "npart")

    def _write_first(self, labs: DataFrame) -> None:
        labs = labs.withColumn("npart", self._hpart(F.col("node")))
        labs.repartition(F.col("npart")).write.mode("overwrite").\
            partitionBy("npart").parquet(self._vdir(1, "labels"))
        cix = labs.select("component", "npart").distinct().\
            withColumn("cpart", self._hpart(F.col("component")))
        cix.repartition(F.col("cpart")).write.mode("overwrite").\
            partitionBy("cpart").parquet(self._vdir(1, "cindex"))
        self._commit(1)

    # -- the incremental step ------------------------------------------------
    def add_batch(
        self,
        edges: DataFrame,
        a: str = "id_a",
        b: str = "id_b",
        nodes: DataFrame | None = None,
        node_col: str | None = None,
        max_iter: int = 50,
    ) -> DataFrame:
        """Merge ``edges`` (plus optional isolated ``nodes``) into the
        store; returns the batch's (node, component) assignments under the
        post-merge labeling.  Store invariant after any batch sequence:
        labels == connected_components over the union of all edges/nodes
        ever added."""
        cur_v = self.version()
        if cur_v == 0:
            labs = connected_components(edges, a, b, nodes=nodes,
                                        node_col=node_col, max_iter=max_iter)
            labs = labs.localCheckpoint()
            self._write_first(labs)
            batch_nodes = edges.select(F.col(a).alias("node")).unionByName(
                edges.select(F.col(b).alias("node")))
            if nodes is not None:
                nc = node_col or nodes.columns[0]
                batch_nodes = batch_nodes.unionByName(
                    nodes.select(F.col(nc).alias("node")))
            return labs.join(batch_nodes.distinct(), "node", "left_semi")

        sym = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        ep = sym.select(F.col("u").alias("node")).unionByName(
            sym.select(F.col("v").alias("node")))
        if nodes is not None:
            nc = node_col or nodes.columns[0]
            ep = ep.unionByName(nodes.select(F.col(nc).alias("node")))
        ep = ep.distinct().withColumn("npart", self._hpart(F.col("node"))).persist()

        # 1. point lookup of current labels — pruned to the batch's nparts
        ep_nparts = [r[0] for r in ep.select("npart").distinct().collect()]
        store_hit = self.labels(nparts=ep_nparts).select("node", "component")
        ep_lab = (
            ep.join(store_hit, "node", "left")
            .select(
                "node", "npart",
                F.coalesce(F.col("component"), F.col("node")).alias("cur"),
                F.col("component").isNull().alias("is_new"),
            )
            .persist()
        )

        # 2. component-level graph (≤ one node per touched component) + CC
        cu = ep_lab.select(F.col("node").alias("u"), F.col("cur").alias("cu"))
        cv = ep_lab.select(F.col("node").alias("v"), F.col("cur").alias("cv"))
        comp_edges = (
            sym.join(F.broadcast(cu), "u").join(F.broadcast(cv), "v")
            .select("cu", "cv")
        )
        cc = connected_components(
            comp_edges, "cu", "cv",
            nodes=ep_lab.select("cur").distinct(), node_col="cur",
            max_iter=max_iter,
        )
        remap = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("old_comp"), F.col("component").alias("new_comp")
        ).localCheckpoint(eager=False)  # tiny (one row per absorbed
        # component); the dom_cparts collect below materializes it in the
        # same driver job — an eager checkpoint would cost one extra

        # 3. label partitions holding members of merged components — via
        # the cindex inverted index, pruned to the merged comps' cparts
        dom = remap.select("old_comp").withColumn(
            "cpart", self._hpart(F.col("old_comp")))
        dom_cparts = [r[0] for r in dom.select("cpart").distinct().collect()]
        cix_cur = self.spark.read.parquet(self._vdir(cur_v, "cindex"))
        dom_rows = (
            cix_cur.filter(F.col("cpart").isin(dom_cparts))
            .join(F.broadcast(remap),
                  F.col("component") == F.col("old_comp"), "left_semi")
            if dom_cparts else cix_cur.filter(F.lit(False))
        )
        # merged-member nparts and new-node nparts in ONE driver job (the
        # two sources are independent, so the union collapses two small
        # sequential collects into one)
        touched_nparts = {
            r[0]
            for r in dom_rows.select("npart")
            .unionByName(ep_lab.filter("is_new").select("npart"))
            .distinct()
            .collect()
        }

        new_v = cur_v + 1
        if not touched_nparts:
            # nothing merged, nothing inserted — no new snapshot needed;
            # every endpoint's current label is already final
            batch = ep_lab.select(
                "node", F.col("cur").alias("component")).localCheckpoint()
            for df in (ep, ep_lab):
                df.unpersist()
            return batch

        # 4. rewrite ONLY the touched label partitions
        old_rows = self.labels(version=cur_v, nparts=sorted(touched_nparts))
        updated = (
            old_rows.join(F.broadcast(remap),
                          old_rows["component"] == remap["old_comp"], "left")
            .select(
                "node",
                F.coalesce("new_comp", "component").alias("component"),
                "npart",
            )
        )
        fresh = (
            ep_lab.filter("is_new")
            .join(F.broadcast(remap),
                  ep_lab["cur"] == remap["old_comp"], "left")
            .select(
                "node",
                F.coalesce("new_comp", "cur").alias("component"),
                "npart",
            )
        )
        out_rows = updated.unionByName(fresh)
        out_rows.repartition(F.col("npart")).write.mode("overwrite").\
            partitionBy("npart").parquet(self._vdir(new_v, "labels"))
        self._link_untouched("labels", cur_v, new_v, "npart", touched_nparts)

        # 5. cindex: drop absorbed comps, re-point their rows at the
        # winner, add new-node rows — only in the affected cparts
        add_rows = (
            dom_rows.join(F.broadcast(remap),
                          dom_rows["component"] == remap["old_comp"])
            .select(F.col("new_comp").alias("component"), "npart")
            .unionByName(
                fresh.select("component", "npart")
            )
            .distinct()
            .withColumn("cpart", self._hpart(F.col("component")))
        )
        add_cparts = {r[0] for r in add_rows.select("cpart").distinct().collect()}
        touched_cparts = set(dom_cparts) | add_cparts
        keep_rows = (
            cix_cur.filter(F.col("cpart").isin(sorted(touched_cparts)))
            .join(F.broadcast(remap),
                  F.col("component") == F.col("old_comp"), "left_anti")
            .select("component", "npart", "cpart")
        )
        cix_out = keep_rows.unionByName(add_rows).distinct()
        cix_out.repartition(F.col("cpart")).write.mode("overwrite").\
            partitionBy("cpart").parquet(self._vdir(new_v, "cindex"))
        self._link_untouched("cindex", cur_v, new_v, "cpart", touched_cparts)

        self._commit(new_v)
        batch = (
            ep_lab.join(F.broadcast(remap),
                        ep_lab["cur"] == remap["old_comp"], "left")
            .select("node", F.coalesce("new_comp", "cur").alias("component"))
        )
        batch = batch.localCheckpoint()
        for df in (ep, ep_lab):
            df.unpersist()
        if self.gc_keep is not None:
            self.gc(keep=self.gc_keep)
        return batch

    def gc(self, keep: int = 2) -> None:
        """Remove snapshot dirs older than the newest ``keep`` versions
        (hard-linked files stay alive while any retained version points at
        them — unlink only drops the dir's references)."""
        cur = self.version()
        for entry in os.listdir(self.path):
            if entry.startswith("v") and entry[1:].isdigit():
                if int(entry[1:]) <= cur - keep:
                    shutil.rmtree(os.path.join(self.path, entry))
