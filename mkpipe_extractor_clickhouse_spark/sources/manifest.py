"""Manifest-committed parquet table: atomic snapshots without a
lakehouse dependency (ROADMAP item 1, built from scratch — no
Delta/Iceberg jars ship in this container).

The commit protocol every table format shares, reduced to its core:

  table_dir/
    batch-<uuid>/           immutable parquet data, one dir per commit
    _manifests/
      v00000001.json        {"dirs": [...], "op": "...", "parent": N-1}
      v00000002.json

A snapshot IS a manifest: the list of batch directories visible at that
version. Writers stage a new batch directory (invisible — readers only
see manifest-listed dirs), then publish by hard-linking a fully-written
temp manifest to ``v<N+1>.json``; ``os.link`` is atomic AND exclusive
on POSIX (EEXIST if the name is taken), so readers observe either the
old or the new snapshot, never a torn state, and two racing writers
cannot both land on the same version — exactly one link succeeds, the
loser gets CommitConflict and retries from the fresh head (optimistic
concurrency, the Delta/Iceberg model). ``os.rename`` would NOT work as
the CAS: rename-to-existing silently replaces on POSIX, so the name
check must be the link itself. A crash before the link leaves only an
unreferenced directory for ``vacuum()`` to sweep.

What this buys over bare ``df.write.mode("append")``:
  * readers never see half-written batches (snapshot isolation);
  * ``overwrite`` is a metadata operation — the new manifest simply
    stops listing old dirs; the data stays until vacuum, which is what
    makes time travel (``read(version=...)``) and instant rollback
    free;
  * commits carry the watermark in the same atomic rename, closing the
    crash window between "data written" and "state committed" that the
    sidecar WatermarkStore necessarily leaves open.

Scale: manifests hold directory names, not per-file lists — O(commits)
bytes, pruned by vacuum; reads hand Spark a list of paths and planning
proceeds exactly as for any multi-dir parquet table (partition pruning
and pushdown unaffected).
"""

from __future__ import annotations

import errno
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_VERSION_DIGITS = 8


class CommitConflict(RuntimeError):
    """Another writer published this version first; retry from head."""


class ConstraintViolation(RuntimeError):
    """A staged batch broke a table CHECK constraint; nothing was
    published and the staged files were removed."""


def _json_safe(v):
    """min/max values → JSON-storable, order-preserving encodings.
    Timestamps become ISO-8601 strings (lexicographic order == time
    order for a fixed format); numbers pass through."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


class ManifestedTable:
    def __init__(
        self,
        table_dir: str,
        stats_cols: tuple[str, ...] = (),
        bloom_cols: tuple[str, ...] = (),
        bloom_bits: int = 4096,
        bloom_hashes: int = 5,
        check_constraints: tuple[str, ...] = (),
    ):
        self.table_dir = table_dir
        # Delta-style CHECK constraints: SQL boolean expressions every
        # row of every staged batch must satisfy (NULL counts as a
        # violation — a constraint must PROVE itself). Enforced in
        # stage_batch, the choke point all write paths share.
        self.check_constraints = tuple(check_constraints)
        # Columns whose per-batch min/max land in the manifest (zone
        # maps): commits compute them once, reads prune whole batch
        # dirs whose range cannot match a predicate — the Iceberg
        # metadata-skipping model at directory granularity.
        self.stats_cols = tuple(stats_cols)
        # Columns carrying a per-batch BLOOM skip index (ClickHouse's
        # bloom_filter skip index / Delta-Iceberg bloom filters): zone
        # maps prune RANGE predicates on clustered columns; the bloom
        # prunes POINT lookups on high-cardinality columns no sort
        # order helps with. md5-double-hashing keeps the bitset
        # engine- and session-portable (no seed, no partitioning
        # dependence), stored hex in the manifest (~bits/4 chars per
        # column per batch).
        self.bloom_cols = tuple(bloom_cols)
        # Round UP to a whole number of bytes: positions are computed
        # mod bloom_bits and the reader re-derives the geometry as
        # len(bits)*8, so a non-multiple-of-8 size would both index
        # past the allocation at write time and disagree with the
        # probe modulus at read time.
        if bloom_bits <= 0:
            raise ValueError(f"bloom_bits must be positive, got {bloom_bits}")
        self.bloom_bits = (bloom_bits + 7) // 8 * 8
        self.bloom_hashes = bloom_hashes
        os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)

    # ---- bloom skip index -------------------------------------------

    def _bloom_positions(
        self, value, bits_n: int | None = None, hashes: int | None = None
    ) -> list[int]:
        """Bit positions of one value: md5 split into two 64-bit words,
        double hashing h1 + i*h2 (Kirsch-Mitzenmacher) — deterministic
        for any engine that can md5 the value's canonical string.

        ``bits_n``/``hashes`` default to the writer-side instance
        config; probes against a PERSISTED bitset must pass the
        geometry stored with it (see bloom_might_contain) so a reader
        constructed with different parameters never computes positions
        mod the wrong size."""
        import hashlib

        key = str(_json_safe(value)).encode("utf-8")
        hx = hashlib.md5(key).hexdigest()
        h1, h2 = int(hx[:16], 16), int(hx[16:32], 16) | 1
        n = self.bloom_bits if bits_n is None else bits_n
        k = self.bloom_hashes if hashes is None else hashes
        return [(h1 + i * h2) % n for i in range(k)]

    def _compute_bloom(self, name: str) -> dict:
        """Per-batch bloom bitsets for ``bloom_cols`` from a
        column-pruned pyarrow read of the staged batch — the same
        build-at-write-time moment ClickHouse materializes its skip
        index granules (one bounded batch, one column; never a second
        full-table scan)."""
        if not self.bloom_cols:
            return {}
        import pyarrow.parquet as pq

        batch_dir = os.path.join(self.table_dir, name)
        out: dict[str, str] = {}
        # recursive walk for hive-partitioned batches (see
        # _compute_stats); a bloomed column living in the PARTITION
        # path contributes no data pages, so it is simply absent here
        # — read_pruned treats a missing entry as might-contain.
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, names in os.walk(batch_dir)
            for f in names
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for col in self.bloom_cols:
            bits = bytearray(self.bloom_bits // 8)
            seen = set()
            for fpath in files:
                if col not in pq.read_schema(fpath).names:
                    continue  # partition-path column: no data pages
                t = pq.read_table(fpath, columns=[col])
                for v in t.column(0).to_pylist():
                    if v is None or v in seen:
                        continue
                    seen.add(v)
                    for pos in self._bloom_positions(v):
                        bits[pos // 8] |= 1 << (pos % 8)
            # Geometry is PERSISTED with the bitset: a reader built
            # with different bloom_bits/bloom_hashes must probe with
            # the writer's parameters or it gets false negatives.
            out[col] = {"bits": bits.hex(), "k": self.bloom_hashes}
        return out

    def bloom_might_contain(self, entry, value) -> bool:
        """Probe one persisted bloom entry. The bit count is derived
        from the stored bitset length and the hash count from the
        stored ``k`` — never from this reader's construction params.
        Any malformed/unreadable geometry returns True (keep the dir):
        skipping is an optimization, never a filter."""
        if isinstance(entry, dict):
            hex_bits = entry.get("bits")
            k = entry.get("k")
        else:  # legacy plain-hex entry (pre-geometry manifests)
            hex_bits, k = entry, self.bloom_hashes
        try:
            bits = bytes.fromhex(hex_bits)
            n = len(bits) * 8
            if n <= 0 or not isinstance(k, int) or k <= 0:
                return True
            return all(
                bits[pos // 8] & (1 << (pos % 8))
                for pos in self._bloom_positions(value, n, k)
            )
        except (TypeError, ValueError):
            return True

    # ---- snapshot bookkeeping -------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(
            self.table_dir,
            _MANIFEST_DIR,
            f"v{version:0{_VERSION_DIGITS}d}.json",
        )

    def versions(self) -> list[int]:
        mdir = os.path.join(self.table_dir, _MANIFEST_DIR)
        out = []
        for name in os.listdir(mdir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def head_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def manifest(self, version: int | None = None) -> dict:
        v = self.head_version() if version is None else version
        if v == 0:
            return {"version": 0, "dirs": [], "op": "init", "meta": {}}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    # ---- writes ----------------------------------------------------

    def stage_batch(
        self, df: DataFrame, partition_by: tuple[str, ...] | None = None
    ) -> str:
        """Write one immutable batch directory; invisible until a
        manifest lists it.  With ``check_constraints`` declared, the
        STAGED files are validated (read back, so post-write types are
        what's checked — the Delta CHECK-constraint model) and a
        violating batch is deleted and refused before any manifest can
        list it: enforcement at the single staging choke point covers
        every write path (append, overwrite, branch, merge, TTL).

        ``partition_by`` lays the batch out hive-partitioned on those
        columns and records the spec in a ``_PARTITION_SPEC.json``
        sidecar (underscore-prefixed — Spark's file index skips it), so
        each batch is SELF-DESCRIBING: the table's partition spec can
        EVOLVE across commits (the Iceberg partition-evolution model —
        old batches keep their layout forever, new batches use the new
        spec, read_evolved merges them)."""
        name = f"batch-{uuid.uuid4().hex[:12]}"
        path = os.path.join(self.table_dir, name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        with open(os.path.join(path, "_PARTITION_SPEC.json"), "w") as fh:
            json.dump({"partition_by": list(partition_by or ())}, fh)
        if self.check_constraints:
            spark = df.sparkSession
            staged = spark.read.parquet(path)
            # ONE validating scan for all constraints: OR the violation
            # predicates together, select a per-constraint violation
            # flag alongside the row, and recover which constraint
            # failed from the flags of the first bad row returned.
            viol = [
                f"(NOT ({e}) OR ({e}) IS NULL)"
                for e in self.check_constraints
            ]
            flags = [
                F.expr(v).alias(f"__viol_{i}") for i, v in enumerate(viol)
            ]
            first = (
                staged.filter(" OR ".join(viol))
                .select(*staged.columns, *flags)
                .first()
            )
            if first is not None:
                shutil.rmtree(path, ignore_errors=True)
                row = first.asDict()
                broken = [
                    e
                    for i, e in enumerate(self.check_constraints)
                    if row.pop(f"__viol_{i}")
                ]
                raise ConstraintViolation(
                    f"CHECK ({broken[0]}) violated by staged batch; "
                    f"example row: {row}"
                )
        return name

    def _compute_stats(self, name: str) -> dict:
        """Per-batch min/max zone maps for ``stats_cols``, read from
        the staged batch's parquet FOOTERS — driver-side metadata
        only, no Spark job and no second scan of the data."""
        if not self.stats_cols:
            return {}
        import pyarrow.parquet as pq

        batch_dir = os.path.join(self.table_dir, name)
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        # recursive walk: hive-partitioned batches (stage_batch
        # partition_by) keep their data files in key=value subdirs
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, names in os.walk(batch_dir)
            for f in names
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for fpath in files:
            md = pq.read_metadata(fpath)
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                for ci in range(group.num_columns):
                    col = group.column(ci)
                    cname = col.path_in_schema
                    if cname not in self.stats_cols:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    if cname not in mins or st.min < mins[cname]:
                        mins[cname] = st.min
                    if cname not in maxs or st.max > maxs[cname]:
                        maxs[cname] = st.max
        return {
            c: [_json_safe(mins[c]), _json_safe(maxs[c])]
            for c in mins
            if c in maxs
        }

    def _publish(
        self,
        dirs: list[str],
        op: str,
        meta: dict,
        parent: int | None = None,
        stats: dict | None = None,
        bloom: dict | None = None,
    ) -> int:
        """Atomic version publish. ``parent`` pins the snapshot this
        commit replaces: the target name becomes v(parent+1), so ANY
        intervening publish makes the link collide and raise — the
        check is the filesystem name itself, no read-then-write gap.
        Append-style commits leave parent unset (they rebase onto
        whatever the head is); replace-style commits (compact) must
        pin it or they would silently drop concurrent appends.

        The publish primitive is ``os.link(tmp, target)``: atomic and
        *exclusive* (EEXIST when target exists). A bare
        ``os.rename`` cannot serve as the CAS — rename onto an
        existing name silently replaces on POSIX, so two racers past
        an exists() check would both "succeed" and the second would
        overwrite the first's commit."""
        head = self.head_version() if parent is None else parent
        version = head + 1
        tmp = os.path.join(
            self.table_dir,
            _MANIFEST_DIR,
            f".tmp-{uuid.uuid4().hex[:12]}.json",
        )
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "parent": head,
                    "op": op,
                    "dirs": dirs,
                    "meta": meta,
                    "stats": {
                        d: s
                        for d, s in (stats or {}).items()
                        if d in dirs and s
                    },
                    **(
                        {
                            "bloom": {
                                d: b
                                for d, b in bloom.items()
                                if d in dirs and b
                            }
                        }
                        if bloom
                        else {}
                    ),
                },
                f,
            )
        target = self._manifest_path(version)
        try:
            os.link(tmp, target)  # atomic-exclusive POSIX publish (CAS)
        except FileExistsError:
            raise CommitConflict(f"version {version} already published")
        finally:
            os.unlink(tmp)
        return version

    def commit_append(
        self,
        df: DataFrame,
        meta: dict | None = None,
        partition_by: tuple[str, ...] | None = None,
    ) -> int:
        """Stage + publish head∪batch; retries version conflicts (the
        staged data is reused — only the metadata rename re-runs).

        ``parent`` is PINNED to the manifest this append merged its
        dirs list against. Without the pin there is a lost-update
        window: the dirs list is computed from one head read while
        _publish would re-read the (possibly newer) head for the
        version number — a concurrent commit landing between the two
        reads would be silently dropped from our dirs list even
        though our publish "succeeds". Pinning makes the stale merge
        collide on the version name instead, and the retry re-merges
        against the fresh head. (Caught by
        tests/test_manifest.py::test_concurrent_appends_lose_no_commit
        under host-load interleavings.)

        ``partition_by`` stages the batch hive-partitioned on those
        columns — the partition spec may differ per commit (partition
        evolution); read via read_evolved."""
        name = self.stage_batch(df, partition_by=partition_by)
        new_stats = self._compute_stats(name)
        new_bloom = self._compute_bloom(name)
        while True:
            head = self.manifest()
            dirs = head["dirs"] + [name]
            stats = {**head.get("stats", {}), name: new_stats}
            bloom = {**head.get("bloom", {}), name: new_bloom}
            try:
                return self._publish(
                    dirs,
                    "append",
                    meta or {},
                    parent=head["version"],
                    stats=stats,
                    bloom=bloom,
                )
            except CommitConflict:
                continue  # re-read head, keep our batch dir

    def commit_overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        """Stage + publish a manifest listing ONLY the new batch — a
        metadata-only table replacement; old data remains for time
        travel until vacuum."""
        name = self.stage_batch(df)
        stats = {name: self._compute_stats(name)}
        bloom = {name: self._compute_bloom(name)}
        while True:
            try:
                return self._publish(
                    [name], "overwrite", meta or {}, stats=stats,
                    bloom=bloom,
                )
            except CommitConflict:
                continue

    def rollback(self, version: int) -> int:
        """Publish a new head that re-exposes an old snapshot's dirs —
        the instant-undo a pipeline needs after a bad batch."""
        old = self.manifest(version)
        while True:
            try:
                return self._publish(
                    old["dirs"], "rollback", {"to_version": version}
                )
            except CommitConflict:
                continue

    # ---- named refs: branches and tags ------------------------------
    #
    # Iceberg-style refs over the SAME linear, CAS-published version
    # log: a ref is a named pointer into the log, stored as a
    # monotonic chain of generation files
    # (_manifest/refs/<name>/g%06d.json) so updating a ref is the same
    # atomic-exclusive os.link CAS the manifest publish uses — two
    # racers on one branch collide on the generation name, never
    # overwrite.  Branch commits merge their dirs against the BRANCH
    # tip (not the table head) and record {ref, ref_base} in meta, so
    # each branch is an isolated snapshot chain while version numbers
    # stay globally unique (no renumbering, time travel unchanged).
    # With refs in play, a versionless read() is the LOG TAIL — the
    # newest snapshot regardless of which ref produced it (an audit /
    # debugging view); governed readers address a ref via read_ref.  A
    # publish that loses the ref CAS leaves a dangling version — the
    # same orphan a failed optimistic commit leaves in Iceberg; it is
    # never reachable from any ref and vacuum may reclaim its batch.

    def _ref_dir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid ref name: {name!r}")
        return os.path.join(self.table_dir, _MANIFEST_DIR, "refs", name)

    def _ref_tip(self, name: str) -> tuple[int, dict]:
        """(generation, ref record) of a ref's current tip."""
        rd = self._ref_dir(name)
        try:
            gens = sorted(
                int(fn[1:-5])
                for fn in os.listdir(rd)
                if fn.startswith("g") and fn.endswith(".json")
            )
        except FileNotFoundError:
            raise KeyError(f"no such ref: {name}") from None
        if not gens:
            raise KeyError(f"no such ref: {name}")
        with open(os.path.join(rd, f"g{gens[-1]:06d}.json")) as f:
            return gens[-1], json.load(f)

    def _ref_set(
        self, name: str, version: int, expect_gen: int, kind: str
    ) -> None:
        """CAS the ref from generation ``expect_gen`` to a new record;
        a concurrent update collides on the generation filename."""
        rd = self._ref_dir(name)
        tmp = os.path.join(rd, f".tmp-{uuid.uuid4().hex[:12]}")
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": version, "kind": kind}, f)
        target = os.path.join(rd, f"g{expect_gen + 1:06d}.json")
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"ref {name} advanced past generation {expect_gen}"
            )
        finally:
            os.unlink(tmp)

    def branch_create(
        self, name: str, version: int | None = None, kind: str = "branch"
    ) -> int:
        """Create a branch (mutable) or tag (immutable) pointing at a
        snapshot (default: current head). Exclusive: creating an
        existing ref raises."""
        if kind not in ("branch", "tag"):
            raise ValueError(f"kind must be branch|tag, got {kind!r}")
        v = self.head_version() if version is None else version
        if v > 0:
            self.manifest(v)  # validates the snapshot exists
        rd = self._ref_dir(name)
        os.makedirs(rd, exist_ok=True)
        if any(fn.endswith(".json") for fn in os.listdir(rd)):
            raise CommitConflict(f"ref {name} already exists")
        self._ref_set(name, v, expect_gen=0, kind=kind)
        return v

    def refs(self) -> dict[str, int]:
        """All refs → tip version."""
        root = os.path.join(self.table_dir, _MANIFEST_DIR, "refs")
        out: dict[str, int] = {}
        if os.path.isdir(root):
            for name in sorted(os.listdir(root)):
                try:
                    out[name] = self._ref_tip(name)[1]["version"]
                except (KeyError, ValueError):
                    continue
        return out

    def branch_head(self, name: str) -> int:
        return self._ref_tip(name)[1]["version"]

    def commit_append_on(
        self, name: str, df: DataFrame, meta: dict | None = None
    ) -> int:
        """Append to a BRANCH: dirs merge against the branch tip (not
        the table head), the new snapshot records its ref lineage, and
        the ref advances by CAS — losing either race retries with the
        staged batch reused, exactly like commit_append."""
        # Reject tags BEFORE staging: stage_batch does a full parquet
        # write + constraint scan, and a tag can never become a branch,
        # so staging first would orphan the batch dir until vacuum.
        if self._ref_tip(name)[1]["kind"] != "branch":
            raise CommitConflict(f"ref {name} is a tag (immutable)")
        batch = self.stage_batch(df)
        new_stats = self._compute_stats(batch)
        new_bloom = self._compute_bloom(batch)
        while True:
            gen, rec = self._ref_tip(name)
            if rec["kind"] != "branch":
                # ref was retargeted to a tag mid-race: don't leak the
                # staged batch dir while refusing the append
                shutil.rmtree(
                    os.path.join(self.table_dir, batch), ignore_errors=True
                )
                raise CommitConflict(f"ref {name} is a tag (immutable)")
            base = self.manifest(rec["version"])
            dirs = base["dirs"] + [batch]
            stats = {**base.get("stats", {}), batch: new_stats}
            bloom = {**base.get("bloom", {}), batch: new_bloom}
            while True:
                try:
                    v = self._publish(
                        dirs,
                        "append",
                        {**(meta or {}), "ref": name,
                         "ref_base": rec["version"]},
                        stats=stats,
                        bloom=bloom,
                    )
                    break
                except CommitConflict:
                    continue  # linear version name taken; renumber
            try:
                self._ref_set(name, v, expect_gen=gen, kind="branch")
                return v
            except CommitConflict:
                continue  # branch tip moved: re-merge against it

    def _ref_chain_contains(self, tip: int, ancestor: int) -> bool:
        """Walk a snapshot's branch lineage (ref_base for branch
        commits, parent otherwise) back to ``ancestor``."""
        v = tip
        while v > ancestor:
            m = self.manifest(v)
            v = (
                m["meta"]["ref_base"]
                if m.get("meta", {}).get("ref") is not None
                else m.get("parent", 0)
            )
        return v == ancestor

    def fast_forward(self, dst: str, src: str) -> int:
        """Advance ref ``dst`` to ``src``'s tip iff dst's tip is an
        ancestor of src's branch chain — the merge that needs no merge.
        Diverged refs raise (a real merge is commit_append_on +
        reconciliation, deliberately explicit)."""
        dgen, drec = self._ref_tip(dst)
        if drec["kind"] != "branch":
            raise CommitConflict(f"ref {dst} is a tag (immutable)")
        sv = self.branch_head(src)
        if sv == drec["version"]:
            return sv
        if not self._ref_chain_contains(sv, drec["version"]):
            raise CommitConflict(
                f"refs diverged: {dst}@{drec['version']} is not an "
                f"ancestor of {src}@{sv}"
            )
        self._ref_set(dst, sv, expect_gen=dgen, kind="branch")
        return sv

    def read_ref(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Snapshot read at a ref's tip."""
        return self.read(spark, version=self.branch_head(name))

    # ---- TTL expiry --------------------------------------------------

    def apply_ttl(self, spark: SparkSession, col: str, cutoff) -> dict:
        """ClickHouse-style table TTL (``TTL ts + INTERVAL ...``):
        expire every row with ``col < cutoff`` in one snapshot
        publish.  Three-way classification per batch dir via the
        manifest's zone maps — METADATA-ONLY drop when the batch max
        is below the cutoff (no read, no write, the common case once
        data is time-clustered), untouched carry-over when the batch
        min is already past it, and a REWRITE only for dirs straddling
        the cutoff (or lacking stats).  Old dirs stay reachable
        through time travel until vacuum, like every other
        replace-style op.  Publishes op='ttl' pinned to the snapshot
        it classified (parent CAS), retrying with staged rewrites
        reused, so a concurrent append can never be silently expired
        against a stale dirs list."""
        from pyspark.sql import functions as F

        cut_key = _json_safe(cutoff)
        rewritten_cache: dict[str, str | None] = {}
        while True:
            m = self.manifest()
            stats = m.get("stats", {})
            dropped, kept, rewrite = [], [], []
            for d in m["dirs"]:
                rng = stats.get(d, {}).get(col)
                if rng is None:
                    rewrite.append(d)  # no zone map → must look at rows
                elif rng[1] < cut_key:
                    dropped.append(d)
                elif rng[0] >= cut_key:
                    kept.append(d)
                else:
                    rewrite.append(d)
            new_dirs = list(kept)
            new_stats = {d: stats[d] for d in kept if d in stats}
            new_bloom = {
                d: b
                for d, b in m.get("bloom", {}).items()
                if d in kept
            }
            for d in rewrite:
                if d not in rewritten_cache:
                    df = spark.read.parquet(
                        os.path.join(self.table_dir, d)
                    ).filter(F.col(col) >= F.lit(cutoff))
                    if df.isEmpty():
                        rewritten_cache[d] = None
                    else:
                        nd = self.stage_batch(df)
                        rewritten_cache[d] = nd
                nd = rewritten_cache[d]
                if nd is not None:
                    new_dirs.append(nd)
                    new_stats[nd] = self._compute_stats(nd)
                    new_bloom[nd] = self._compute_bloom(nd)
            try:
                v = self._publish(
                    new_dirs,
                    "ttl",
                    {"col": col, "cutoff": _json_safe(cutoff)},
                    parent=m["version"],
                    stats=new_stats,
                    bloom=new_bloom,
                )
            except CommitConflict:
                continue  # classify again against the fresh head
            return {
                "version": v,
                "dropped_metadata_only": sorted(dropped),
                "rewritten": sorted(d for d in rewrite),
                "kept": sorted(kept),
            }

    def apply_ttl_rollup(
        self, spark: SparkSession, col: str, cutoff, agg_builder
    ) -> dict:
        """ClickHouse ``TTL ... GROUP BY`` (rollup TTL): rows older
        than the cutoff are not deleted but COLLAPSED — ``agg_builder``
        maps the expired rows to their aggregate replacement (same
        schema, e.g. one row per (day, type) with value summed), which
        is staged as one batch alongside the surviving recent rows.
        Zone maps classify dirs exactly like apply_ttl: dirs entirely
        past the cutoff carry over by name; whole-expired and
        straddling dirs contribute their old rows to ONE global
        aggregation (stronger than ClickHouse's per-part rollup — no
        partial groups survive).  Publish is parent-pinned with staged
        work reused on conflict."""
        from pyspark.sql import functions as F

        cut_key = _json_safe(cutoff)
        staged: dict[tuple[str, ...], tuple[str | None, list[str]]] = {}
        while True:
            m = self.manifest()
            stats = m.get("stats", {})
            old_side, kept = [], []
            for d in m["dirs"]:
                rng = stats.get(d, {}).get(col)
                if rng is not None and rng[0] >= cut_key:
                    kept.append(d)
                else:
                    old_side.append(d)  # expired or straddling or no stats
            key = tuple(sorted(old_side))
            if key not in staged:
                new_dirs_for_old: list[str] = []
                rolled_dir: str | None = None
                if old_side:
                    paths = [
                        os.path.join(self.table_dir, d) for d in old_side
                    ]
                    src = spark.read.option("mergeSchema", "true").parquet(
                        *paths
                    )
                    survivors = src.filter(F.col(col) >= F.lit(cutoff))
                    if not survivors.isEmpty():
                        new_dirs_for_old.append(self.stage_batch(survivors))
                    rolled = agg_builder(
                        src.filter(F.col(col) < F.lit(cutoff))
                    )
                    if not rolled.isEmpty():
                        rolled_dir = self.stage_batch(rolled)
                staged[key] = (rolled_dir, new_dirs_for_old)
            rolled_dir, survivor_dirs = staged[key]
            new_dirs = list(kept) + list(survivor_dirs)
            if rolled_dir is not None:
                new_dirs.append(rolled_dir)
            new_stats = {d: stats[d] for d in kept if d in stats}
            new_bloom = {
                d: b for d, b in m.get("bloom", {}).items() if d in kept
            }
            for d in new_dirs:
                if d not in new_stats and d not in kept:
                    new_stats[d] = self._compute_stats(d)
                    new_bloom[d] = self._compute_bloom(d)
            try:
                v = self._publish(
                    new_dirs,
                    "ttl_rollup",
                    {"col": col, "cutoff": _json_safe(cutoff)},
                    parent=m["version"],
                    stats=new_stats,
                    bloom=new_bloom,
                )
            except CommitConflict:
                continue
            return {
                "version": v,
                "collapsed_dirs": sorted(old_side),
                "rolled_dir": rolled_dir,
                "kept": sorted(kept),
            }

    # ---- reads -----------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """Snapshot read (head, or time travel to ``version``).

        Returns None for an empty table. mergeSchema for the same
        schema-evolution tolerance as ParquetLoader.read.  A snapshot
        containing hive-partitioned batches (partition evolution)
        delegates to read_evolved — a flat multi-path scan would
        misplan mixed layouts."""
        m = self.manifest(version)
        if not m["dirs"]:
            return None
        if any(self.batch_spec(d) for d in m["dirs"]):
            return self.read_evolved(spark, version)
        paths = [os.path.join(self.table_dir, d) for d in m["dirs"]]
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def batch_spec(self, name: str) -> tuple[str, ...]:
        """The partition spec a batch dir was staged with (empty tuple
        for flat batches and for batches staged before specs existed —
        both read identically)."""
        p = os.path.join(self.table_dir, name, "_PARTITION_SPEC.json")
        try:
            with open(p) as fh:
                return tuple(json.load(fh).get("partition_by", ()))
        except OSError:
            return ()

    def read_evolved(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """Snapshot read across EVOLVING partition specs (the Iceberg
        partition-evolution read model): batches staged flat, batches
        partitioned by one spec, and batches partitioned by a later
        spec coexist in one table; each dir is planned with ITS OWN
        layout (hive partition inference per basePath, so partition
        pruning still applies per batch where the filter touches that
        batch's partition columns) and the union aligns schemas by
        name with missing columns as NULL.  One logical Union of
        per-dir scans — Catalyst pushes row filters into every leg."""
        m = self.manifest(version)
        if not m["dirs"]:
            return None
        groups: dict[tuple[str, ...], list[str]] = {}
        for d in m["dirs"]:
            groups.setdefault(self.batch_spec(d), []).append(d)
        parts = []
        for spec, dirs in sorted(groups.items()):
            paths = [os.path.join(self.table_dir, d) for d in dirs]
            # same-spec dirs share one multi-path scan (one file index)
            parts.append(
                spark.read.option("mergeSchema", "true").parquet(*paths)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def read_with_commit_seq(
        self,
        spark: SparkSession,
        seq_col: str = "_commit_seq",
        version: int | None = None,
    ) -> DataFrame | None:
        """Snapshot read with each row stamped with the version of the
        commit that first introduced its batch dir — derived from the
        manifest chain, NOT a physical column in the data. This is the
        merge-on-read primitive: latest-per-key resolution orders by
        ``seq_col`` (see x9). One lazy per-dir scan unioned — same
        planning as ``read`` plus a constant column per dir."""
        from pyspark.sql import functions as F

        v = self.head_version() if version is None else version
        first_seen: dict[str, int] = {}
        for ver in self.versions():
            if ver > v:
                break
            for d in self.manifest(ver)["dirs"]:
                first_seen.setdefault(d, ver)
        dirs = self.manifest(v)["dirs"]
        if not dirs:
            return None
        parts = [
            spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(self.table_dir, d))
            .withColumn(seq_col, F.lit(first_seen[d]))
            for d in dirs
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ---- maintenance ----------------------------------------------

    def _zvalue(self, cols: tuple[str, ...], base_version: int):
        """Morton (Z-order) key over ``cols``, built from the snapshot's
        OWN zone-map stats — no extra scan, no driver collect: each
        column linearly buckets into 2^bits using the manifest's global
        [min, max], and the bucket bits interleave into one long
        (the f16 geohash construction generalized to any columns).

        Linear bucketing keeps buckets balanced for roughly uniform
        columns; heavily skewed columns still CLUSTER correctly (the
        z-curve just allocates them fewer distinct buckets).  Delta's
        OPTIMIZE ZORDER uses sampled range boundaries for the same
        step; swap the bucket expression there if skew ever matters."""
        from pyspark.sql import functions as F

        bits = {1: 20, 2: 16, 3: 10, 4: 8}.get(len(cols), 8)
        m = self.manifest(base_version)
        stats = m.get("stats", {})
        buckets = []
        for c in cols:
            rngs = [s[c] for s in stats.values() if c in s]
            if not rngs:
                raise ValueError(
                    f"zorder_by column {c!r} has no zone-map stats — "
                    f"add it to stats_cols so commits record min/max"
                )
            lo = min(r[0] for r in rngs)
            hi = max(r[1] for r in rngs)
            span = float(hi) - float(lo)
            if span <= 0:
                buckets.append(F.lit(0).cast("long"))
                continue
            norm = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            buckets.append(
                F.least(
                    F.greatest(
                        F.floor(norm * F.lit(float(1 << bits))), F.lit(0)
                    ),
                    F.lit((1 << bits) - 1),
                ).cast("long")
            )
        n = len(buckets)
        z = F.lit(0).cast("long")
        for i in range(bits):
            for j, b in enumerate(buckets):
                bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
        return z

    def compact(
        self,
        spark: SparkSession,
        target_files: int = 1,
        sort_by: str | None = None,
        zorder_by: tuple[str, ...] | None = None,
        split_dirs: bool = False,
    ) -> int:
        """OPTIMIZE: rewrite the head snapshot's many per-commit batch
        dirs into one coalesced dir and publish it as a new version —
        content-identical, metadata-only from a reader's view (readers
        on the old head keep their snapshot; vacuum reclaims it later).
        The incremental-append pattern accretes one small dir per tick;
        periodic compaction restores scan parallelism and bounds the
        path list, exactly like ClickHouse's background merges or
        Delta's OPTIMIZE.

        ``sort_by`` adds data CLUSTERING (Delta's OPTIMIZE ZORDER for
        the single-column case): rows range-partition and sort on the
        column before the rewrite, so each output file covers a
        narrow, disjoint value range — the zone maps the manifest
        records for ``stats_cols`` become maximally selective, and
        ``read_pruned`` on that column skips almost everything.

        ``zorder_by`` is the MULTI-column form (Delta's OPTIMIZE
        ZORDER BY proper): rows cluster on a Morton-interleaved key of
        the named columns, so files cover small hyper-rectangles and
        range predicates on ANY of the columns prune — single-column
        sort only serves its leading column.

        ``split_dirs`` publishes each clustered range partition as its
        OWN batch dir, so the MANIFEST zone maps (not just parquet
        footers) become selective and ``prune_dirs`` skips whole dirs
        without touching storage — at 100 TB that is the difference
        between listing k paths and footer-probing thousands."""
        base = self.head_version()
        df = self.read(spark, version=base)
        if df is None:
            return base
        if zorder_by is not None:
            z = self._zvalue(tuple(zorder_by), base)
            compacted = (
                df.withColumn("__zkey", z)
                .repartitionByRange(target_files, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        elif sort_by is not None:
            compacted = df.repartitionByRange(
                target_files, sort_by
            ).sortWithinPartitions(sort_by)
        else:
            compacted = df.coalesce(target_files)
        name = self.stage_batch(compacted)
        names = [name]
        if split_dirs and (sort_by is not None or zorder_by is not None):
            # one dir per range partition: pure driver-side renames of
            # the files Spark already wrote range-disjoint
            staged = os.path.join(self.table_dir, name)
            files = sorted(
                f for f in os.listdir(staged) if f.endswith(".parquet")
            )
            if len(files) > 1:
                names = []
                for i, fn in enumerate(files):
                    sub = f"{name}-p{i:04d}"
                    os.makedirs(os.path.join(self.table_dir, sub))
                    os.rename(
                        os.path.join(staged, fn),
                        os.path.join(self.table_dir, sub, fn),
                    )
                    names.append(sub)
                shutil.rmtree(staged)
        # Unlike append, compaction must replace EXACTLY the snapshot it
        # rewrote: if any writer published after ``base``, committing
        # the compacted dir would silently drop their rows. Pinning
        # parent=base makes any intervening publish collide on the
        # version file name; on conflict, abandon the orphan dir (for
        # vacuum) — the next compaction run picks up the new head.
        try:
            return self._publish(
                names,
                "compact",
                {},
                parent=base,
                stats={n: self._compute_stats(n) for n in names},
            )
        except CommitConflict:
            for n in names:
                shutil.rmtree(os.path.join(self.table_dir, n))
            return self.head_version()

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys: tuple[str, ...],
        meta: dict | None = None,
    ) -> int:
        """MERGE INTO (upsert): source rows REPLACE current rows with
        the same key (matched → update), unmatched source rows insert.
        Copy-on-write, the Delta/Iceberg CoW model: the merged snapshot
        is staged as a fresh batch and published with ``parent``
        pinned to the snapshot it merged against — a concurrent append
        between our read and publish collides on the version name and
        the merge retries against the new head (staged data from the
        failed attempt is left for vacuum). Readers always see either
        the pre-merge or the post-merge snapshot, never a mix.

        Scale note: CoW rewrites the whole snapshot, the right trade
        for merge-heavy-but-small tables (dimensions, state). For fact
        tables, partition-scope the rewrite (sources/merge.py does
        this for the plain parquet loader) or layer the x9
        merge-on-read view and compact lazily."""
        keep_keys = list(keys)
        while True:
            base = self.head_version()
            current = self.read(spark)
            if current is None:
                merged = source
            else:
                remaining = current.join(
                    source.select(*keep_keys).distinct(), keep_keys, "left_anti"
                )
                merged = remaining.unionByName(source)
            name = self.stage_batch(merged)
            try:
                return self._publish(
                    [name],
                    "merge",
                    meta or {},
                    parent=base,
                    stats={name: self._compute_stats(name)},
                )
            except CommitConflict:
                shutil.rmtree(os.path.join(self.table_dir, name))
                continue  # re-read the new head and re-merge

    def delete_rows(
        self,
        spark: SparkSession,
        col: str,
        value,
        meta: dict | None = None,
    ) -> int:
        """Surgical DELETE (the right-to-be-forgotten primitive):
        rewrite ONLY the batch dirs whose zone map can contain
        ``col == value``; every other batch carries over BY NAME into
        the new snapshot — its files are never opened, never copied,
        and remain byte-identical (the property tests assert). This is
        the Delta/Iceberg delete-with-file-skipping model: cost scales
        with the data that actually holds the subject, not the table.
        Requires ``col`` in stats_cols for selectivity (dirs without
        stats are conservatively rewritten). Publishes with ``parent``
        pinned — a concurrent append collides and the delete retries
        against the new head, so the erased rows can never resurface
        through a lost-update race."""
        from pyspark.sql import functions as F

        while True:
            base = self.head_version()
            m = self.manifest(base)
            touched, untouched = self.prune_dirs(col, value, value, base)
            if not touched:
                return base  # value provably absent — nothing to do
            paths = [os.path.join(self.table_dir, d) for d in touched]
            remaining = (
                spark.read.option("mergeSchema", "true")
                .parquet(*paths)
                .filter(~F.col(col).eqNullSafe(F.lit(value)))
            )
            name = self.stage_batch(remaining)
            dirs = untouched + [name]
            stats = {
                **{
                    d: s
                    for d, s in m.get("stats", {}).items()
                    if d in untouched
                },
                name: self._compute_stats(name),
            }
            try:
                return self._publish(
                    dirs,
                    "delete",
                    {**(meta or {}), "col": col, "value": _json_safe(value)},
                    parent=base,
                    stats=stats,
                )
            except CommitConflict:
                shutil.rmtree(os.path.join(self.table_dir, name))
                continue  # re-read the new head and re-target

    def clone_at(
        self, dest_dir: str, version: int | None = None
    ) -> "ManifestedTable":
        """Zero-copy CLONE (Delta's shallow-clone-made-durable): a new
        independent table whose batch files are HARDLINKS to this
        snapshot's files — O(files) metadata work, no data copied, and
        safe against the source's future vacuum (links keep the inodes
        alive even if the source unlinks its names). The clone starts
        at version 1 with only the cloned snapshot's dirs; histories
        do not follow. The dev/test idiom: fork a production snapshot
        instantly, mutate the fork freely."""
        m = self.manifest(version)
        clone = ManifestedTable(dest_dir, stats_cols=self.stats_cols)
        try:
            for d in m["dirs"]:
                src = os.path.join(self.table_dir, d)
                dst = os.path.join(dest_dir, d)
                os.makedirs(dst, exist_ok=True)
                for fn in os.listdir(src):
                    try:
                        os.link(os.path.join(src, fn), os.path.join(dst, fn))
                    except OSError as e:
                        # EXDEV: dest on a different filesystem — a
                        # hardlink can't cross mounts, so fall back to a
                        # real copy (still correct, just not zero-copy).
                        if e.errno != errno.EXDEV:
                            raise
                        shutil.copy2(
                            os.path.join(src, fn), os.path.join(dst, fn)
                        )
        except OSError:
            # don't leave a half-created clone tree behind
            shutil.rmtree(dest_dir, ignore_errors=True)
            raise
        clone._publish(
            list(m["dirs"]),
            "clone",
            {"source": self.table_dir, "source_version": m["version"]},
            stats=dict(m.get("stats", {})),
        )
        return clone

    # ---- metadata skipping (zone maps) -----------------------------

    def prune_dirs(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> tuple[list[str], list[str]]:
        """Split a snapshot's batch dirs into (kept, skipped) for a
        range predicate ``lo <= col <= hi`` using the manifest's
        per-batch min/max. A dir is skipped only when its recorded
        range PROVABLY cannot intersect the query range; dirs without
        stats are always kept (skipping is an optimization, never a
        filter). Bounds are compared in the same encoding the stats
        were stored in (_json_safe: timestamps as ISO strings)."""
        m = self.manifest(version)
        stats = m.get("stats", {})
        lo_k = _json_safe(lo) if lo is not None else None
        hi_k = _json_safe(hi) if hi is not None else None
        kept, skipped = [], []
        for d in m["dirs"]:
            rng = stats.get(d, {}).get(col)
            if rng is None:
                kept.append(d)
                continue
            mn, mx = rng
            if (hi_k is not None and mn > hi_k) or (
                lo_k is not None and mx < lo_k
            ):
                skipped.append(d)
            else:
                kept.append(d)
        return kept, skipped

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame | None:
        """Snapshot read that opens ONLY the batch dirs whose zone map
        can match ``lo <= col <= hi`` — manifest-level file skipping on
        top of parquet's own row-group pruning. The predicate is still
        applied to the surviving rows (stats skip, they do not
        filter)."""
        from pyspark.sql import functions as F

        kept, _ = self.prune_dirs(col, lo, hi, version)
        if not kept:
            return None
        paths = [os.path.join(self.table_dir, d) for d in kept]
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def prune_dirs_point(
        self, col: str, value, version: int | None = None
    ) -> tuple[list[str], list[str]]:
        """Split a snapshot's dirs into (kept, skipped) for an EQUALITY
        probe ``col = value`` using the per-batch bloom index. A dir is
        skipped only when its bloom PROVABLY lacks the value (no false
        negatives by construction — every committed distinct value set
        its bits); dirs without a bloom for ``col`` are always kept
        (skipping is an optimization, never a filter). False positives
        only cost an extra dir open, never correctness."""
        m = self.manifest(version)
        blooms = m.get("bloom", {})
        kept, skipped = [], []
        for d in m["dirs"]:
            hx = blooms.get(d, {}).get(col)
            if hx is None or self.bloom_might_contain(hx, value):
                kept.append(d)
            else:
                skipped.append(d)
        return kept, skipped

    def read_point(
        self, spark: SparkSession, col: str, value, version: int | None = None
    ) -> DataFrame | None:
        """Point-lookup read that opens ONLY the batch dirs whose bloom
        might contain ``value`` — the ClickHouse bloom_filter skip
        index at directory granularity, complementing read_pruned's
        zone maps (ranges need clustering; equality on an unsorted
        high-cardinality column needs a bloom). The predicate is still
        applied to surviving rows."""
        from pyspark.sql import functions as F

        kept, _ = self.prune_dirs_point(col, value, version)
        if not kept:
            return None
        paths = [os.path.join(self.table_dir, d) for d in kept]
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        return df.filter(F.col(col) == F.lit(value))

    def vacuum(
        self, keep_versions: int = 1, min_age_seconds: float = 3600.0
    ) -> list[str]:
        """Delete batch dirs unreferenced by the newest
        ``keep_versions`` manifests (and drop older manifests).
        Returns the removed dir names. With keep_versions=1 only the
        live snapshot survives — time travel is traded for space.

        ``min_age_seconds`` is the Delta/Iceberg-style retention guard:
        a concurrent writer inside stage→publish has a staged dir that
        is indistinguishable from a crash orphan, so only dirs whose
        mtime is older than the threshold are swept — an in-flight
        commit is never deleted out from under its publish. Pass 0 ONLY
        when the caller holds exclusive access to the table."""
        import time

        vs = self.versions()
        keep = vs[-keep_versions:] if keep_versions > 0 else []
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self.manifest(v)["dirs"])
        now = time.time()
        removed = []
        for name in os.listdir(self.table_dir):
            full = os.path.join(self.table_dir, name)
            if (
                name.startswith("batch-")
                and os.path.isdir(full)
                and name not in referenced
                and now - os.path.getmtime(full) >= min_age_seconds
            ):
                shutil.rmtree(full)
                removed.append(name)
        for v in vs:
            if v not in keep:
                os.unlink(self._manifest_path(v))
        return removed


# ---- ExtractResult integration ------------------------------------

from dataclasses import dataclass  # noqa: E402


def _staged_rows(batch_dir: str) -> int:
    """Row count of a staged batch from parquet footers only (driver-
    side metadata, no Spark job)."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(batch_dir):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(batch_dir, f)).num_rows
    return total

from .extract import (  # noqa: E402
    ExtractResult,
    ParquetExtractor,
    TableConfig,
    apply_write_partitions,
)


@dataclass
class ManifestLoader:
    """ParquetLoader's contract over manifest-committed tables, with
    the watermark folded INTO the commit: the sidecar WatermarkStore
    leaves a crash window between "data written" and "state committed"
    (survivable only because appends are idempotent); here the same
    atomic manifest rename publishes data and watermark together, so
    the window does not exist at all."""

    dest_dir: str
    # auto-maintenance: after a commit leaves more than this many batch
    # dirs, run a compaction tick (ClickHouse's background-merge role /
    # Delta's auto-OPTIMIZE).  None disables.  Conflict-safe by
    # construction: compact pins parent to the snapshot it rewrote and
    # abandons on interleaved commits, so the incremental tick itself
    # can never lose rows to maintenance.
    auto_compact_max_dirs: int | None = None

    def table(self, table: TableConfig) -> ManifestedTable:
        name = table.target_name or table.name
        return ManifestedTable(
            os.path.join(self.dest_dir, f"{name}.mfst"),
            stats_cols=getattr(table, "stats_columns", ()),
        )

    def last_point(self, table: TableConfig) -> str | None:
        """Watermark of the newest commit that recorded one."""
        mt = self.table(table)
        for v in reversed(mt.versions()):
            lp = mt.manifest(v)["meta"].get("last_point")
            if lp is not None:
                return lp
        return None

    def load(
        self, spark: SparkSession, table: TableConfig, result: ExtractResult
    ) -> int | None:
        """Stage the batch, resolve the observed watermark (the staging
        write IS the observation's action), publish both atomically.
        Same boundary-bounded idempotent-append dedup as ParquetLoader."""
        if result.df is None:
            return None
        df = result.df
        mt = self.table(table)
        if (
            result.write_mode == "append"
            and table.dedup_keys
            and mt.manifest()["dirs"]
        ):
            existing = mt.read(spark)
            window = result.window
            if (
                window is not None
                and not window.is_trivial
                and window.column in existing.columns
            ):
                existing = existing.filter(window.to_column())
            df = df.join(
                existing.select(*table.dedup_keys),
                on=list(table.dedup_keys),
                how="left_anti",
            )
        if table.write_partitions:
            df = apply_write_partitions(df, table.write_partitions)

        name = mt.stage_batch(df)
        if result.write_mode == "append" and _staged_rows(
            os.path.join(mt.table_dir, name)
        ) == 0:
            # Pure boundary re-read (every batch row was already in the
            # destination): publishing would only churn versions, and
            # the watermark cannot have advanced — dedup removes only
            # rows the destination already holds, all ≤ the stored
            # last_point. Footer row counts are a driver-side metadata
            # read, NOT a Spark action, so the write-time observation
            # is never consumed by this check.
            shutil.rmtree(os.path.join(mt.table_dir, name))
            return None
        meta = {"last_point": result.resolve_last_point()}
        new_stats = mt._compute_stats(name)
        while True:
            head = mt.manifest()
            if result.write_mode == "overwrite":
                dirs, stats = [name], {name: new_stats}
            else:
                dirs = head["dirs"] + [name]
                stats = {**head.get("stats", {}), name: new_stats}
            try:
                v = mt._publish(dirs, result.write_mode, meta, stats=stats)
                if (
                    self.auto_compact_max_dirs is not None
                    and len(dirs) > self.auto_compact_max_dirs
                ):
                    # best-effort maintenance AFTER the tick's commit is
                    # durable; a concurrent writer makes compact abort,
                    # never the reverse
                    mt.compact(spark, target_files=1)
                return v
            except CommitConflict:
                continue


@dataclass
class ManifestIncrementalRunner:
    """extract → stage → one atomic publish (data + watermark).

    No WatermarkStore: the incremental state lives in the table's own
    commit history, read back via ManifestLoader.last_point — a crash
    anywhere leaves either the old snapshot+old watermark or the new
    snapshot+new watermark, never a mix."""

    extractor: ParquetExtractor
    loader: ManifestLoader

    def run_once(
        self, spark: SparkSession, table: TableConfig, source_filter=None
    ) -> ExtractResult:
        last_point = self.loader.last_point(table)
        result = self.extractor.extract(
            table, spark, last_point=last_point, source_filter=source_filter
        )
        self.loader.load(spark, table, result)
        return result


class ManifestStreamSink:
    """Exactly-once streaming into a manifest-committed table.

    foreachBatch is at-least-once: after a crash the engine re-delivers
    the last unacknowledged micro-batch. The manifest's commit metadata
    carries the batch_id, so a re-delivered batch is recognized at the
    head and skipped — together with atomic publication this upgrades
    the sink to exactly-once visibility: a reader at any moment sees
    each micro-batch's rows exactly once or not yet, never twice and
    never partially. (Same contract as sources/rollup.py's high-water
    mark, expressed through the snapshot protocol.)"""

    def __init__(self, table_dir: str):
        self.table = ManifestedTable(table_dir)

    def last_batch_id(self) -> int | None:
        for v in reversed(self.table.versions()):
            b = self.table.manifest(v)["meta"].get("batch_id")
            if b is not None:
                return b
        return None

    def handle(self, batch_df: DataFrame, batch_id: int) -> bool:
        """foreachBatch body; returns False for a skipped re-delivery."""
        last = self.last_batch_id()
        if last is not None and batch_id <= last:
            return False
        self.table.commit_append(batch_df, meta={"batch_id": batch_id})
        return True

    def run_available_now(self, stream: DataFrame, checkpoint: str) -> None:
        q = (
            stream.writeStream.foreachBatch(self.handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def manifest_stream_sink(
    spark: SparkSession,
    stream: DataFrame,
    table_dir: str,
    checkpoint: str,
) -> ManifestedTable:
    """Drain ``stream`` into a manifest table with AvailableNow; see
    ManifestStreamSink for the exactly-once contract."""
    sink = ManifestStreamSink(table_dir)
    sink.run_available_now(stream, checkpoint)
    return sink.table


# ---- catalog-level multi-table transactions ------------------------


class ManifestCatalog:
    """Cross-table atomic commits over manifest tables — the capability
    single-table formats (Delta, Iceberg) lack without an external
    transactional catalog: a pipeline tick that lands `events` AND its
    `orders` rollup must expose BOTH new snapshots or NEITHER, or a
    reader joining them sees a torn combination.

    Mechanism: one more manifest level. Each catalog version is a JSON
    file pinning {table_name: table_version}; it publishes with the
    same os.link atomic-exclusive CAS the tables use. A transactional
    commit first lands each table's own version (data + per-table
    manifest, invisible to catalog readers), then publishes ONE catalog
    version pinning all of them. Catalog readers resolve every table
    through the catalog head, so the multi-table flip is a single
    filesystem link — readers observe the old tuple or the new tuple,
    never a mix. Crash between table publish and catalog publish leaves
    the new table versions unreferenced-by-catalog (still time-travel
    readable; the next successful tick's catalog version supersedes).

    Scale: a catalog version is O(tables) bytes; contention is on one
    tiny link per tick, identical to the per-table cost."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir
        self._dir = os.path.join(root_dir, "_catalog")
        os.makedirs(self._dir, exist_ok=True)

    # versions ------------------------------------------------------

    def _path(self, version: int) -> str:
        return os.path.join(self._dir, f"c{version:0{_VERSION_DIGITS}d}.json")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._dir):
            if name.startswith("c") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def head_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def snapshot(self, version: int | None = None) -> dict[str, int]:
        v = self.head_version() if version is None else version
        if v == 0:
            return {}
        with open(self._path(v)) as f:
            return json.load(f)["tables"]

    # tables --------------------------------------------------------

    def table(self, name: str, stats_cols: tuple[str, ...] = ()) -> ManifestedTable:
        return ManifestedTable(
            os.path.join(self.root_dir, f"{name}.mfst"), stats_cols=stats_cols
        )

    # commits -------------------------------------------------------

    def _publish_catalog(
        self, tables: dict[str, int], meta: dict, parent: int
    ) -> int:
        """Publish v(parent+1) or raise CommitConflict. ``parent`` must
        be the snapshot the ``tables`` map was MERGED against — the
        same lost-update pin as ManifestedTable.commit_append: without
        it, two ticks writing different tables would carry stale pins
        for each other's tables and the second publish would silently
        roll one table's pointer back."""
        version = parent + 1
        tmp = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex[:12]}.json")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "tables": tables, "meta": meta}, f
            )
        try:
            os.link(tmp, self._path(version))
            return version
        except FileExistsError:
            raise CommitConflict(f"catalog version {version} already published")
        finally:
            os.unlink(tmp)

    def commit_multi(
        self,
        writes: dict[str, tuple[DataFrame, str]],
        meta: dict | None = None,
    ) -> int:
        """Atomic multi-table commit: ``writes`` maps table name →
        (df, mode) with mode 'append' | 'overwrite'. Each table's own
        version lands first (catalog-invisible), then one catalog
        version pins them all. Unlisted tables carry forward at their
        current pinned version."""
        ours: dict[str, int] = {}
        for name, (df, mode) in writes.items():
            t = self.table(name)
            if mode == "overwrite":
                ours[name] = t.commit_overwrite(df)
            elif mode == "append":
                ours[name] = t.commit_append(df)
            else:
                raise ValueError(f"unknown mode: {mode}")
        # optimistic retry: merge OUR table versions over the freshest
        # snapshot each attempt, pin the parent we merged against — a
        # concurrent tick's pins for OTHER tables are never clobbered
        while True:
            base = self.head_version()
            pinned = {**self.snapshot(base), **ours}
            try:
                return self._publish_catalog(pinned, meta or {}, parent=base)
            except CommitConflict:
                continue

    # reads ---------------------------------------------------------

    def read(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame | None:
        """Read a table AT the catalog snapshot — cross-table
        consistent: two reads against the same catalog version always
        join coherently, whatever writers do meanwhile."""
        snap = self.snapshot(version)
        if name not in snap:
            return None
        return self.table(name).read(spark, version=snap[name])
