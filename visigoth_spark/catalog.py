"""Index catalog: named indexes + many-to-many aliases with hot-swap.

Re-expresses the reference's ``IndexRepo`` (repos_repo.go:35-326) — an
in-memory map of indexes plus alias lists guarded by RWMutexes — as a tiny
JSON manifest in the catalog root plus per-index directories. Spark needs no
mutexes: writes are driver-side manifest transactions (atomic rename), reads
are immutable DataFrames. The goroutine fan-out over aliased indexes
(repos_repo.go:196-213) becomes a plan-level union executed by task
parallelism.

Semantics ported 1:1 (tests in tests/test_catalog.py):
- Put/ingest via alias fans out to ALL aliased indexes (repos_repo.go:228-236)
- Search via alias unions results from all aliased indexes; unlike the
  reference (which concatenates unordered, repos_repo.go:206-209), we re-sort
  globally — a strict improvement required for deterministic top-k
- Alias only attaches to existing indexes (repos_repo.go:70-102)
- UnAlias with empty index drops the whole alias (repos_repo.go:104-136)
- Rename rewrites alias targets in place (repos_repo.go:139-160)
- Drop scrubs the index from every alias and removes empty aliases
  (repos_repo.go:240-269)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visigoth_spark.analysis import AnalyzerConfig, DEFAULT_ANALYZER
from visigoth_spark.build import build_index
from visigoth_spark.query import SearchIndex, _order_cols


class Catalog:
    """≙ NewIndexRepo (repos_repo.go:318-326)."""

    def __init__(self, spark: SparkSession, root: str,
                 analyzer: AnalyzerConfig = DEFAULT_ANALYZER):
        from visigoth_spark import storage as vstore

        self.spark = spark
        self.root = root
        self.analyzer = analyzer
        self._store = vstore.get_store(root, spark)
        self._store.makedirs(root)
        self._manifest_path = os.path.join(root, "catalog.json")
        if not self._store.exists(self._manifest_path):
            self._save({"indexes": [], "aliases": {}})

    # ---- manifest ----------------------------------------------------------
    def _load(self) -> dict:
        return self._store.read_json(self._manifest_path)

    def _save(self, m: dict) -> None:
        self._store.write_json_atomic(self._manifest_path, m)

    def _index_dir(self, name: str) -> str:
        return os.path.join(self.root, f"idx_{name}")

    # ---- D7/D8/D9: listing + existence probes ------------------------------
    def list(self) -> list[str]:
        return sorted(self._load()["indexes"])

    def list_aliases(self) -> dict[str, list[str]]:
        return {a: sorted(v) for a, v in self._load()["aliases"].items()}

    def has(self, name: str) -> bool:
        return name in self._load()["indexes"]

    def has_alias(self, alias: str) -> bool:
        return alias in self._load()["aliases"]

    # ---- resolution (repos_repo.go:283-306) --------------------------------
    def _resolve(self, name: str) -> list[str]:
        m = self._load()
        if name in m["indexes"]:
            return [name]
        if name in m["aliases"]:
            return list(m["aliases"][name])
        return []

    # ---- D1: ingest (lazy index creation, alias fan-out) --------------------
    def ingest(self, name: str, corpus: DataFrame, **build_kwargs) -> list[str]:
        """Build/rebuild the named index (or every index behind an alias)
        from the given corpus. Lazy creation ≙ repos_repo.go:219-226."""
        targets = self._resolve(name)
        if not targets:
            m = self._load()
            m["indexes"].append(name)
            self._save(m)
            targets = [name]
        for t in targets:
            build_index(self.spark, corpus, self._index_dir(t),
                        analyzer=self.analyzer, **build_kwargs)
        return targets

    def append(self, name: str, corpus: DataFrame,
               **append_kwargs) -> list[str]:
        """Incremental Put (≙ IndexRepo.Put, repos_repo.go:216-238: the
        reference's Put APPENDS documents to every index behind the name —
        it never rebuilds). Fans ``build.append_index`` out to all targets;
        lazily creates the index when the name is unknown, exactly like
        ``ingest``. The appended batches can later be folded back into the
        canonical layout with :meth:`compact`."""
        from visigoth_spark.build import append_index

        targets = self._resolve(name)
        if not targets:
            m = self._load()
            m["indexes"].append(name)
            self._save(m)
            targets = [name]
        for t in targets:
            append_index(self.spark, corpus, self._index_dir(t),
                         analyzer=self.analyzer, **append_kwargs)
        return targets

    def delete(self, name: str, urls) -> int:
        """Tombstone the given urls in every index behind ``name``
        (build.delete_docs — LSM deletion: masked at query time, purged by
        compact). Returns the total newly tombstoned count. An UPDATE is
        ``delete`` + ``append`` (replace-by-url semantics)."""
        from visigoth_spark.build import delete_docs

        total = 0
        for t in self._resolve(name):
            total += delete_docs(self.spark, self._index_dir(t), urls=urls)
        return total

    def merge(self, name: str,
              num_partitions: int | None = None,
              min_batches: int = 2) -> list[str]:
        """Tiered MINOR compaction for every index behind ``name`` (an
        index or an alias): collapse its appended batches into one
        term-range tier (build.merge_appends — file layout only, results
        byte-identical). Indexes with fewer than ``min_batches`` appended
        batches are left untouched; returns the names actually merged."""
        from visigoth_spark.build import merge_appends

        targets = self._resolve(name)
        if not targets:
            raise KeyError(f"index {name!r} does not exist")
        merged = []
        for t in targets:
            if merge_appends(self.spark, self._index_dir(t),
                             num_partitions=num_partitions,
                             min_batches=min_batches) is not None:
                merged.append(t)
        return merged

    def compact(self, name: str,
                num_partitions: int | None = None) -> list[str]:
        """Force-merge every index behind ``name`` (an index or an alias)
        back to the canonical single-batch layout (build.compact_index,
        in-place swap). Aliases reference index NAMES, not paths, so they
        remain valid across the swap."""
        from visigoth_spark.build import compact_index

        targets = self._resolve(name)
        if not targets:
            raise KeyError(f"index {name!r} does not exist")
        for t in targets:
            compact_index(self.spark, self._index_dir(t),
                          num_partitions=num_partitions)
        return targets

    # ---- D2: search with alias fan-out --------------------------------------
    def search(self, name: str, query: str, engine: str = "bm25",
               k: int | None = 10, include_raw: bool = False,
               route: str = "auto", **search_kwargs) -> DataFrame:
        """Extra keyword args (slop / exclude / highlight / after /
        ...) forward to :meth:`SearchIndex.search` on every target."""
        targets = self._resolve(name)
        if not targets:
            raise KeyError(f"index {name!r} does not exist")  # repos_repo.go:182
        if search_kwargs.get("after") is not None and len(targets) > 1:
            # the cursor's docid tiebreak is a PER-INDEX namespace: the
            # same (score, docid) pair means different rows on different
            # targets, so fan-out pagination would silently drop rows —
            # refuse instead (paginate a single index, or merge pages
            # client-side on (score, url))
            raise ValueError(
                "after= pagination is not supported across a multi-index "
                f"alias ({len(targets)} targets) — the cursor docid is a "
                "per-index namespace"
            )
        frames = [
            SearchIndex(self.spark, self._index_dir(t), self.analyzer)
            .search(query, engine, k, include_raw=include_raw, route=route,
                    **search_kwargs)
            for t in targets
        ]
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2)
        if len(frames) > 1:
            out = out.orderBy(*_order_cols(engine))
            if k is not None and engine not in ("linear", "noop_all"):
                out = out.limit(k)
        return out

    # ---- D3/D4: aliases ------------------------------------------------------
    def alias(self, alias: str, index: str) -> bool:
        m = self._load()
        if index not in m["indexes"]:
            return False  # only existing indexes may be aliased
        lst = m["aliases"].setdefault(alias, [])
        if index not in lst:
            lst.append(index)
        self._save(m)
        return True

    def unalias(self, alias: str, index: str = "") -> bool:
        m = self._load()
        if alias not in m["aliases"]:
            return False
        if index == "":
            del m["aliases"][alias]  # drop whole alias
        else:
            if index not in m["aliases"][alias]:
                return False
            m["aliases"][alias].remove(index)
            if not m["aliases"][alias]:
                del m["aliases"][alias]
        self._save(m)
        return True

    # ---- D5: rename (keeps aliases pointing at the new name) ----------------
    def rename(self, old: str, new: str) -> bool:
        m = self._load()
        if old not in m["indexes"] or new in m["indexes"]:
            return False
        old_dir, new_dir = self._index_dir(old), self._index_dir(new)
        if self._store.exists(new_dir):
            # an UNREGISTERED leftover at the destination (manual copy,
            # partially failed drop): the store's rename is replace-rename
            # (needed by the compaction swap), so going ahead would
            # silently destroy it — refuse and surface the conflict
            # instead (≙ os.rename's old EEXIST behavior)
            return False
        m["indexes"].remove(old)
        m["indexes"].append(new)
        for lst in m["aliases"].values():
            for i, n in enumerate(lst):
                if n == old:
                    lst[i] = new
        if self._store.exists(old_dir):
            self._store.rename(old_dir, new_dir)
        self._save(m)
        return True

    # ---- D6: drop (cascades to aliases) --------------------------------------
    def drop(self, name: str) -> bool:
        m = self._load()
        if name not in m["indexes"]:
            return False
        m["indexes"].remove(name)
        for alias in list(m["aliases"]):
            lst = m["aliases"][alias]
            if name in lst:
                lst.remove(name)
            if not lst:
                del m["aliases"][alias]
        self._save(m)
        d = self._index_dir(name)
        if self._store.exists(d):
            self._store.rmtree(d)
        return True
