"""Transactional parquet tables: a minimal versioned-manifest log.

The reference persists Silver/Gold history as Delta tables (ACID commit
log over parquet; reference `2-spark_processed_assats_list.py:65`,
`3-spark_curated_analytics_full.py:86-90`). This environment ships no delta-spark
jars (`sinks.table_format` gates on the import and falls back to plain
parquet), which leaves the ACID/time-travel CAPABILITY untested. This
module supplies it with the same public design Delta/Iceberg use — an
append-only log of versioned manifests over immutable parquet data
files — small enough to audit, with the commit protocol the interesting
part:

- Data files are written to a fresh, version-private staging directory
  (``data/v{N}-{attempt}``) — never into a shared path, so a failed or
  abandoned write is INVISIBLE: no manifest references it.
- A commit is ONE atomic ``os.link`` of a temp manifest to
  ``_txlog/{N:08d}.json``. Readers either see version N fully or not at
  all (atomicity); link fails if the name exists (POSIX), so two
  concurrent writers racing to version N get exactly one winner —
  the loser retries at N+1 against the refreshed snapshot (optimistic
  concurrency, Delta's protocol).
- Each manifest holds the COMPLETE active file list for its version
  (snapshot manifests, not deltas): a reader pins one manifest and is
  isolated from every later commit (snapshot isolation), and time
  travel is just reading an older manifest.
- Data files are immutable and never deleted by commits; ``vacuum``
  removes files unreferenced by the kept manifests (the only
  destructive operation, explicitly invoked).

Local-FS scope, documented: ``os.link`` is atomic on POSIX
filesystems; object stores need a conditional-put/contended-rename
primitive instead (the same caveat Delta's LogStore abstracts). This is
the single-box stand-in for the Delta path, not a replacement — when
delta-spark is on the classpath, ``sinks.formatted`` already prefers it.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"
_DATA_DIR = "data"
_STAGE_SEQ = __import__("itertools").count()  # per-process staging uniqueness


class CommitConflict(RuntimeError):
    """Another writer committed this version first (caller may retry)."""


@dataclass(frozen=True)
class TxSnapshot:
    version: int
    mode: str
    files: tuple[str, ...]
    partition_by: tuple[str, ...] = ()


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _manifest_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:08d}.json")


def _versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(name[:-5])
        for name in os.listdir(log)
        if name.endswith(".json") and name[:-5].isdigit()
    )


def snapshot(table: str, version: int | None = None) -> TxSnapshot:
    """Pin a manifest: the latest by default, or ``version`` for time
    travel. The returned file list is immutable — later commits cannot
    change what this snapshot reads (snapshot isolation)."""
    table = os.path.realpath(table)
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed version in {table!r}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"version {v} not in {table!r} (have {versions[0]}..{versions[-1]})"
        )
    with open(_manifest_file(table, v)) as fh:
        m = json.load(fh)
    return TxSnapshot(
        version=v,
        mode=m["mode"],
        files=tuple(m["files"]),
        partition_by=tuple(m.get("partition_by") or ()),
    )


def _stage_of(table: str, path: str) -> str:
    """The version-private staging directory a data file belongs to —
    the first path component under ``data/``. Needed as the Spark
    ``basePath`` so hive-style ``key=value`` partition directories
    inside the stage are recovered as columns. Files OUTSIDE ``data/``
    (a pre-txlog layout adopted as version 0) anchor at the table root,
    which parses their partition dirs identically."""
    data_root = os.path.join(table, _DATA_DIR)
    rel = os.path.relpath(path, data_root)
    if rel.split(os.sep)[0] == os.pardir:
        return table
    return os.path.join(data_root, rel.split(os.sep)[0])


def read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    *,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the pinned snapshot's files (empty-file-list versions read as
    an empty frame is not supported — commits always carry >= 1 file;
    an overwrite with an empty frame still writes parquet metadata).

    ``merge_schema=True`` resolves the union schema across commits
    (reference S7 semantics: Delta merges at write, parquet/txlog at
    read — older rows surface NULL for columns added later).

    Partitioned tables read as one scan PER staging directory (each
    needs its own ``basePath`` to recover the hive-style partition
    columns), unioned by name. Delta/Iceberg collapse this into one
    scan via a log-backed FileIndex; this local stand-in instead bounds
    the group count operationally — ``compact()`` rewrites the live
    snapshot into a single stage (Delta's OPTIMIZE), and partition
    pruning still reaches every per-stage scan (PartitionFilters,
    pinned in tests/test_tx_table.py)."""
    table = os.path.realpath(table)
    snap = snapshot(table, version)
    if not snap.partition_by:
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*snap.files)
    groups: dict[str, list[str]] = {}
    for f in snap.files:
        groups.setdefault(_stage_of(table, f), []).append(f)
    out: DataFrame | None = None
    for stage in sorted(groups):
        part = spark.read.option("basePath", stage).parquet(*groups[stage])
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=merge_schema)
        )
    assert out is not None  # snapshot always has >= 1 file
    return out


def _parquet_files(directory: str) -> list[str]:
    """All parquet files under ``directory``, recursively — partitioned
    writes nest them inside ``key=value`` subdirectories."""
    return sorted(
        os.path.join(dirpath, f)
        for dirpath, _, names in os.walk(directory)
        for f in names
        if f.endswith(".parquet")
    )


def _fsync_tree(directory: str) -> None:
    """fsync every file and directory under ``directory``: Spark writes
    the staged parquet through the page cache, so without this a power
    loss after commit could leave a DURABLE manifest referencing torn
    or absent data files — the other half of the two-fsync protocol."""
    for dirpath, _, names in os.walk(directory, topdown=False):
        for f in names:
            fd = os.open(os.path.join(dirpath, f), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(dirpath, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _manifest_txn(table: str, version: int) -> list | None:
    with open(_manifest_file(table, version)) as fh:
        return json.load(fh).get("txn")


def _find_txn(table: str, txn: tuple[str, int]) -> TxSnapshot | None:
    """An already-committed version carrying this (app_id, txn_version)
    marker — the idempotent-replay check (Delta's txnAppId/txnVersion).
    Vacuum retains manifests inside its retention window precisely so
    these markers survive a replay gap (same operational contract as
    Delta streaming). Scanned NEWEST-first: a replayed epoch is almost
    always among the most recent commits, so hits are O(1); the no-
    replay miss still reads the whole log — Delta's setTransactions
    checkpoint summary is the upgrade if that ever paces a stream."""
    want = [txn[0], int(txn[1])]
    for v in reversed(_versions(table)):
        with contextlib.suppress(FileNotFoundError):
            if _manifest_txn(table, v) == want:
                return snapshot(table, v)
    return None


def _walk_legacy(table: str):
    """os.walk over the table EXCLUDING the log/staging subtrees —
    pruned at the walk level (``dirnames`` edit on a topdown walk), so
    a vacuum of a table with thousands of staging dirs never stats them
    here (code-review r8; the old relpath filter still descended into
    and listed every pruned directory). Pruned at EVERY depth, matching
    the original any-path-component exclusion exactly: a nested dir
    literally named ``data`` inside a legacy layout stays invisible to
    adoption AND to the vacuum legacy sweep — narrowing the exclusion
    to the table root would let vacuum delete files that were never
    adopted into any manifest (code-review r8, second pass)."""
    for dirpath, dirnames, names in os.walk(table, topdown=True):
        dirnames[:] = [d for d in dirnames if d not in (_LOG_DIR, _DATA_DIR)]
        yield dirpath, dirnames, names


def _adopted_ledger_file(table: str) -> str:
    return os.path.join(_log_path(table), "adopted.json")


def _adopted_files(table: str) -> set[str]:
    """Files the table actually ADOPTED at migration (version 0) — the
    only legacy paths vacuum may reclaim. Sources, in order: the durable
    adoption ledger, else a still-present version-0 ``adopt`` manifest
    (tables migrated before the ledger existed) — in which case the
    ledger is BACKFILLED on the spot: vacuum deletes old manifests at
    the end of its pass, so without the backfill a pre-ledger table
    would lose its adoption record the first time manifest 0 ages out
    and leak its adopted files forever (code-review r9). When neither
    survives, returns empty — leaking an adopted file beats destroying
    a user one (ADVICE r9)."""
    with contextlib.suppress(FileNotFoundError, json.JSONDecodeError):
        with open(_adopted_ledger_file(table)) as fh:
            return set(json.load(fh))
    with contextlib.suppress(FileNotFoundError, json.JSONDecodeError, KeyError):
        with open(_manifest_file(table, 0)) as fh:
            m = json.load(fh)
        if m.get("mode") == "adopt":
            _write_adopted_ledger(table, sorted(m["files"]))
            return set(m["files"])
    return set()


def _write_adopted_ledger(table: str, files: list[str]) -> None:
    """Atomically persist the adoption ledger (idempotent: the link
    loser is a no-op). A concurrent vacuum's ``.tmp-*`` sweep can
    unlink the tmp between write and link — retried with a fresh tmp,
    because in the BACKFILL path this may be the same vacuum pass that
    deletes manifest 0 (the only other record) at its end, so 'the
    next reader retries' would have nothing left to read
    (code-review r9 pass 2)."""
    for _ in range(3):
        tmp = os.path.join(
            _log_path(table),
            f".tmp-adopt-{os.getpid()}-{next(_STAGE_SEQ)}.ledger",
        )
        with open(tmp, "w") as fh:
            json.dump(files, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _adopted_ledger_file(table))
        except FileExistsError:
            pass  # another writer landed identical content
        except FileNotFoundError:
            continue  # tmp swept mid-link: retry with a fresh tmp
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
        return
    # exhausting the retries must be LOUD: in the backfill path the
    # sweeping vacuum may delete manifest 0 — the only other record —
    # at the end of its own pass, so returning silently here would be
    # the permanent-leak outcome the retry exists to prevent
    # (code-review r9 pass 3)
    raise RuntimeError(
        f"could not persist the adoption ledger for {table!r}: the tmp"
        " file was swept by a concurrent vacuum on every attempt"
    )


def _legacy_files(table: str) -> list[str]:
    """Parquet OUTSIDE the log/staging subtrees — the pre-txlog layout
    :func:`_adopt_legacy` migrates."""
    return sorted(
        os.path.join(dirpath, f)
        for dirpath, _, names in _walk_legacy(table)
        for f in names
        if f.endswith(".parquet")
    )


def has_legacy_files(table: str) -> bool:
    """True when the pre-txlog layout exists — the ONLY layout
    ``sinks.read_history`` may fall back to reading raw: staged-but-
    uncommitted data under ``data/`` must stay invisible."""
    return bool(_legacy_files(table))


def _legacy_partition_keys(table: str, files: list[str]) -> tuple[str, ...]:
    """The hive-style partition-key sequence a legacy layout actually
    encodes: the ordered ``key=`` directory components of each file's
    path relative to the table root. All files must agree — a mixed
    layout has no single partition spec and cannot be adopted."""
    keys: set[tuple[str, ...]] = set()
    for f in files:
        rel_dirs = os.path.relpath(os.path.dirname(f), table).split(os.sep)
        keys.add(tuple(d.split("=", 1)[0] for d in rel_dirs if "=" in d))
    if len(keys) > 1:
        raise ValueError(
            f"legacy layout under {table!r} mixes partition specs "
            f"{sorted(keys)}; cannot adopt it as one txlog version"
        )
    return next(iter(keys)) if keys else ()


def _adopt_legacy(table: str, pby: tuple[str, ...]) -> None:
    """Migrate a pre-txlog plain-parquet directory in place: if the
    table has NO committed version but parquet files exist outside the
    log/staging subtrees (a layout written by the parquet fallback of
    earlier releases), commit them as version 0 ('adopt') so the first
    txlog append COMPOSES with the existing rows instead of silently
    shadowing them. The files stay where they are — manifests reference
    absolute paths, and ``read`` anchors their partition parsing at the
    table root (hive-style ``key=value`` dirs keep working).

    The manifest's ``partition_by`` is INFERRED from the legacy
    directory structure, not trusted from the caller: stamping a
    mismatched spec (e.g. ``None`` onto a hive-partitioned layout)
    would make ``read`` silently drop the partition columns from the
    adopted rows (ADVICE r8). A caller spec that disagrees with the
    layout raises instead."""
    if _versions(table):
        return
    legacy = _legacy_files(table)
    if not legacy:
        return
    layout_pby = _legacy_partition_keys(table, legacy)
    if layout_pby != pby:
        raise ValueError(
            f"cannot adopt legacy layout under {table!r}: its directory"
            f" structure encodes partition_by={list(layout_pby)} but the"
            f" first txlog commit requested {list(pby)} — migrate the"
            f" files (or match the spec) before committing"
        )
    os.makedirs(_log_path(table), exist_ok=True)
    manifest = {
        "version": 0,
        "mode": "adopt",
        "files": sorted(legacy),
        "partition_by": list(pby),
    }
    tmp = os.path.join(
        _log_path(table), f".tmp-adopt-{os.getpid()}-{next(_STAGE_SEQ)}"
    )
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    with contextlib.suppress(FileExistsError):
        os.link(tmp, _manifest_file(table, 0))
    with contextlib.suppress(FileNotFoundError):
        os.unlink(tmp)
    # Durable adoption ledger: vacuum's legacy sweep may only reclaim
    # files that were ACTUALLY adopted into the table. The version-0
    # manifest records them, but vacuum eventually deletes old
    # manifests — this ledger (never vacuumed) preserves the record, so
    # an unadopted parquet landing in the table directory AFTER the
    # first commit is user data the sweep must never touch (ADVICE r9).
    # Concurrent adopters write identical content (link loser no-op);
    # a concurrent vacuum sweeping the tmp is survivable — manifest 0
    # exists, so _adopted_files backfills on next read (code-review r9).
    _write_adopted_ledger(table, sorted(legacy))


def commit(
    df: DataFrame,
    table: str,
    mode: str = "append",
    *,
    partition_by: list[str] | tuple[str, ...] | None = None,
    max_retries: int = 5,
    expected_base_version: int | None = None,
    txn: tuple[str, int] | None = None,
) -> TxSnapshot:
    """Write ``df`` as a new atomic version of ``table``.

    ``append`` keeps the previous snapshot's files and adds the new
    ones; ``overwrite`` replaces the active set (old files stay on disk
    for time travel until ``vacuum``). Returns the committed snapshot.

    ``partition_by`` writes hive-style ``key=value`` directories inside
    the staging dir (recovered as partition columns at read, with
    PartitionFilters pruning — same contract as Delta's partitioned
    tables). It must be consistent across every commit to a table; the
    manifest records it and a mismatch raises ValueError.

    Protocol per attempt: stage data under a version-private directory,
    write a temp manifest, ``os.link`` it into the log — the atomic
    commit point. A link conflict (concurrent winner) re-reads the
    latest snapshot and retries at the next version, so appends compose
    correctly under concurrency; the orphaned staging directory of a
    lost attempt is invisible (no manifest references it) and is
    reclaimed by ``vacuum``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    # canonicalize: manifests store absolute file paths derived from the
    # table path, and vacuum compares them VERBATIM — a relative spelling
    # here with an absolute one there would classify every live file as
    # unreferenced (code-review r7)
    table = os.path.realpath(table)
    os.makedirs(_log_path(table), exist_ok=True)
    pby = tuple(partition_by or ())
    _adopt_legacy(table, pby)

    last_err: Exception | None = None
    corrupt_err: RuntimeError | None = None
    for attempt in range(max_retries):
        if txn is not None:
            # idempotent replay (Delta's txnAppId/txnVersion): this
            # transaction already committed — return it, write nothing
            done = _find_txn(table, txn)
            if done is not None:
                return done
        prior = _versions(table)
        version = (prior[-1] + 1) if prior else 0
        if expected_base_version is not None and (
            (prior[-1] if prior else None) != expected_base_version
        ):
            # read-modify-write callers (compact) must NOT retry over a
            # base that moved — blind retry would silently discard the
            # concurrent commit's rows (lost update)
            raise CommitConflict(
                f"{table!r} moved past expected base version "
                f"{expected_base_version} (now at "
                f"{prior[-1] if prior else 'empty'})"
            )
        if prior:
            existing = snapshot(table).partition_by
            if existing != pby:
                raise ValueError(
                    f"partition_by mismatch for {table!r}: table has "
                    f"{list(existing)}, commit requested {list(pby)}"
                )
        if corrupt_err is not None and prior:
            # the previous attempt rolled back over a corrupt base and
            # retried to heal the transient retracted-version race —
            # if the latest snapshot is STILL unhealthy after a grace
            # pause, fail here before re-staging: each blind retry
            # costs a full data write plus a momentarily-visible
            # corrupt manifest concurrent readers can pin (code-review
            # r9 pass 2). The pause gives a stalled writer mid-rollback
            # time to retract (pass 3: the instant re-check was itself
            # a race); a manifest unlinked between listdir and open is
            # that retraction happening — treat as healed and proceed.
            time.sleep(0.2)
            try:
                healthy = all(
                    os.path.exists(f) for f in snapshot(table).files
                )
            except FileNotFoundError:
                healthy = True  # state moved under us: re-read next pass
            if not healthy:
                raise corrupt_err  # the corrupt-base RuntimeError,
                # captured at detection (last_err may since have been
                # overwritten by an unrelated CommitConflict)
            corrupt_err = None  # healed: back to the normal path
        # staging name carries (pid, per-process seq): unique per WRITER,
        # not just per (version, attempt) — two concurrent writers racing
        # to the same version must never share a staging directory
        stage = os.path.join(
            table,
            _DATA_DIR,
            f"v{version:08d}-{os.getpid()}-{next(_STAGE_SEQ)}",
        )
        writer = df.write.mode("error")
        if pby:
            writer = writer.partitionBy(*pby)
        writer.parquet(stage)
        _fsync_tree(stage)  # data durable BEFORE the manifest can be
        files = _parquet_files(stage)
        base: tuple[str, ...] = ()
        if mode == "append" and prior:
            base = snapshot(table).files
        manifest = {
            "version": version,
            "mode": mode,
            "files": [*base, *files],
            "partition_by": list(pby),
        }
        if txn is not None:
            manifest["txn"] = [txn[0], int(txn[1])]
        # writer-unique temp name (pid + per-process seq): two racing
        # writers must never share the pre-commit manifest path either
        tmp = os.path.join(
            _log_path(table),
            f".tmp-{version:08d}-{os.getpid()}-{next(_STAGE_SEQ)}",
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            # durability: the manifest's BYTES must be on stable storage
            # before the link makes it visible — otherwise a power loss
            # can leave a visible-but-empty manifest (torn commit)
            fh.flush()
            os.fsync(fh.fileno())
        target = _manifest_file(table, version)
        # atomic, fails-if-exists commit point: exactly one writer wins
        # a version (rename with a pre-existence check has a TOCTOU
        # window, so rely on link(2) semantics). The try covers ONLY the
        # link — the commit is DECIDED the instant it succeeds, so no
        # later cleanup error may re-enter the retry loop (a retry after
        # a successful link would commit the same rows twice).
        try:
            os.link(tmp, target)
        except FileExistsError as exc:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
            last_err = CommitConflict(
                f"version {version} of {table!r} was committed concurrently"
            )
            last_err.__cause__ = exc
            continue  # retry against the refreshed snapshot
        except FileNotFoundError as exc:
            # a concurrent vacuum swept our tmp manifest between write
            # and link — indistinguishable from losing the race; retry
            last_err = CommitConflict(
                f"tmp manifest for version {version} of {table!r} was"
                " swept concurrently (vacuum)"
            )
            last_err.__cause__ = exc
            continue
        # linked — but guard the one remaining corruption window: a
        # writer stalled longer than the vacuum retention between
        # staging and linking may have had its staged DATA reclaimed
        # (the tmp-manifest ENOENT path only catches the tmp sweep).
        # Verify EVERY file the manifest references — the new ones AND
        # the inherited base: a concurrent appender may have pinned a
        # soon-to-be-retracted version as its base (the version IS
        # momentarily visible between link and rollback), and checking
        # only its own new files would let it commit a manifest that
        # inherits dangling paths (ADVICE r8). If anything is missing,
        # roll the just-linked manifest back — a momentarily-visible-
        # then-retracted version beats a permanently corrupt one; a
        # reader or appender that pinned it in the window sees ENOENT /
        # rolls back in turn, which is the transient failure the
        # retention-window violation already implies.
        missing_new = [f for f in files if not os.path.exists(f)]
        missing_base = [f for f in base if not os.path.exists(f)]
        if missing_new or missing_base:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(target)
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
            if missing_base:
                # inherited files gone — but distinguish the TRANSIENT
                # race this very branch creates from genuine corruption:
                # the base we pinned may have been a momentarily-visible
                # version a stalled writer linked and then retracted
                # (the rollback above). Re-read the now-latest snapshot;
                # if ITS files are all present the pinned base was
                # merely retracted and a retry composes against a
                # healthy base. Hard-error only when the genuinely-
                # latest snapshot references missing data — a real
                # retention-window violation retries cannot heal, where
                # a silent retry would propagate dangling paths or let a
                # stalled writer's duplicate rows land (ADVICE r9).
                latest = _versions(table)
                base_healthy = (not latest) or all(
                    os.path.exists(f) for f in snapshot(table).files
                )
                if not base_healthy:
                    # even an unhealthy LATEST may be the other writer's
                    # not-yet-rolled-back poisoned version (it unlinks
                    # milliseconds after we looked) — so RETRY rather
                    # than raise, and hard-error only if the corruption
                    # outlives every attempt (code-review r9; the
                    # post-loop raise preserves the r8 contract for
                    # genuine retention-window violations)
                    corrupt_err = RuntimeError(
                        f"base snapshot of {table!r} references missing"
                        f" data files (retention-window violation"
                        f" upstream); refusing to commit over a corrupt"
                        f" base: {missing_base[:3]}"
                    )
                    last_err = corrupt_err
                    continue
                last_err = CommitConflict(
                    f"base version pinned for {table!r} was retracted by"
                    " a concurrent writer's rollback; retrying against"
                    " the refreshed snapshot"
                )
                continue
            last_err = CommitConflict(
                f"staged data for version {version} of {table!r} was"
                " vacuumed while the writer was stalled (exceeded the"
                " retention window); restaging"
            )
            continue
        # committed. tmp cleanup is best-effort (vacuum may have beaten
        # us to it — the TARGET link is what the table reads).
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)
        # durability: persist the directory entry too — rename/link is
        # atomic in the VFS but not durable until the log dir's metadata
        # is synced (the same two-fsync protocol journaling filesystems
        # and Delta's LogStore both require)
        dir_fd = os.open(_log_path(table), os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        return TxSnapshot(
            version=version,
            mode=mode,
            files=tuple(manifest["files"]),
            partition_by=pby,
        )
    raise last_err if last_err else RuntimeError("commit failed")


def compact(spark: SparkSession, table: str) -> TxSnapshot:
    """Delta's OPTIMIZE for this stand-in: rewrite the live snapshot as
    ONE overwrite commit, collapsing the per-commit staging groups (and
    their small files) into a single stage. Time travel to pre-compact
    versions keeps working until ``vacuum`` reclaims them; a reader of
    a partitioned table goes back to a single scan afterwards.

    Read-modify-write safety: the overwrite is pinned to the snapshot
    version it read (``expected_base_version``) — if a concurrent
    append lands first, this raises :class:`CommitConflict` instead of
    silently overwriting the table with pre-append data (the lost-
    update Delta's OPTIMIZE also refuses). Callers retry the whole
    compact (re-read + re-commit)."""
    snap = snapshot(table)
    df = read(spark, table, merge_schema=True)
    return commit(
        df,
        table,
        "overwrite",
        partition_by=list(snap.partition_by) or None,
        expected_base_version=snap.version,
    )


_SIDECARS = ("_SUCCESS",)


def _prune_empty_legacy_dirs(table: str) -> None:
    """Remove legacy subdirectories (outside the log/staging subtrees)
    whose parquet has all been vacuumed: Spark's ``_SUCCESS``/``.crc``
    sidecars go with them, exactly like the staging-dir rmtree above.
    The table root itself is never removed (a root-level ``_SUCCESS``
    from the legacy write is harmless and stays). One pruned topdown
    walk, processed in reverse (children before parents) so emptied
    parents cascade — a live re-list per dir, because a child removed
    earlier in the pass still sits in the recorded walk entries."""
    dirs = [dp for dp, _, _ in _walk_legacy(table) if dp != table]
    for dirpath in reversed(dirs):
        try:
            names = os.listdir(dirpath)
        except FileNotFoundError:
            continue  # removed with an ancestor? (defensive; reversed
            # order deletes children first, so normally unreachable)
        if any(os.path.isdir(os.path.join(dirpath, d)) for d in names):
            continue  # a surviving child dir means live data below
        if all(
            f in _SIDECARS or f.endswith(".crc") or f.startswith(".")
            for f in names
        ):
            shutil.rmtree(dirpath)


def vacuum(
    table: str, keep_last: int = 2, *, retention_seconds: float = 3600.0
) -> list[str]:
    """Delete data files unreferenced by the ``keep_last`` newest
    manifests (and drop the older manifests) — the only destructive
    operation; readers pinned to a vacuumed version lose it, exactly
    like Delta's VACUUM. Covers staged files under ``data/`` AND
    adopted legacy files outside it (a migrated table fully reclaims
    its pre-txlog layout once nothing references it). Returns the
    deleted parquet paths.

    ``retention_seconds`` protects everything RECENT (Delta's retention
    check, default 1 h here vs Delta's 7 days), uniformly:

    - staging dirs and ``.tmp-*`` manifests younger than the window are
      never touched (a fresh unreferenced dir may be an in-flight
      commit that has not linked its manifest yet);
    - COMMITTED manifests younger than the window are RETAINED even
      beyond ``keep_last`` — and their files count as live — so recent
      time travel keeps working and, critically, recent txn idempotency
      markers survive: dropping a young manifest would let a replayed
      streaming epoch commit its rows a second time (code-review r7).

    Lower it below any plausible write/replay duration (e.g. 0 in
    tests) only when no writer can be live.

    A dead staging dir is removed wholesale (shutil.rmtree) — Spark
    writes ``_SUCCESS``/``.crc`` sidecars alongside the parquet, so an
    ``os.rmdir`` after deleting only ``*.parquet`` would never fire and
    dead dirs would accumulate (ADVICE r6)."""
    if keep_last < 1:
        raise ValueError(
            f"vacuum: keep_last must be >= 1 (the live version can never"
            f" be reclaimed), got {keep_last}"
        )
    table = os.path.realpath(table)  # same canonical form as commit()
    versions = _versions(table)
    if not versions:
        return []
    cutoff = time.time() - retention_seconds
    # retained = the keep_last newest, plus EVERY version still inside
    # the retention window (time travel + txn markers stay intact there)
    keep = set(versions[-keep_last:])
    for v in versions:
        if os.path.getmtime(_manifest_file(table, v)) > cutoff:
            keep.add(v)
    live: set[str] = set()
    for v in sorted(keep):
        live.update(snapshot(table, v).files)
    deleted: list[str] = []
    data_root = os.path.join(table, _DATA_DIR)
    for sub in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        subdir = os.path.join(data_root, sub)
        parquet = list(_parquet_files(subdir))
        if all(f not in live for f in parquet):
            # no live file in this staging dir — but only reclaim it if
            # it is OLDER than the retention window (a fresh dir may be
            # an in-flight commit that has not linked its manifest yet)
            if os.path.getmtime(subdir) > cutoff:
                continue
            deleted.extend(parquet)
            shutil.rmtree(subdir)
            continue
        for f in parquet:
            if f not in live:
                os.unlink(f)
                deleted.append(f)
    # adopted legacy files live OUTSIDE data/ — without this sweep they
    # would leak forever once every manifest referencing them is gone
    # (overwrite + vacuum), and has_legacy_files would stay true for an
    # already-migrated table (ADVICE r8). Restricted to files the table
    # actually ADOPTED (the durable ledger _adopt_legacy writes): a
    # parquet landing in the table dir after the first commit was never
    # referenced by any manifest and is user data, not reclaimable
    # garbage — the doctrine test_nested_data_dir_stays_invisible
    # already states, now applied to every unadopted path (ADVICE r9).
    adopted = _adopted_files(table)
    for f in _legacy_files(table):
        if f in adopted and f not in live and os.path.getmtime(f) <= cutoff:
            os.unlink(f)
            deleted.append(f)
    _prune_empty_legacy_dirs(table)
    for v in versions:
        if v not in keep:
            os.unlink(_manifest_file(table, v))
    log = _log_path(table)
    for name in os.listdir(log):
        p = os.path.join(log, name)
        if name.startswith(".tmp-") and os.path.getmtime(p) <= cutoff:
            os.unlink(p)
    return deleted
