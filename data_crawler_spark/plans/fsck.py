"""State-dir integrity checker — fsck for the crawl's snapshot layout.

A 100 TB crawl state is a tree of versioned-manifest tables
(plans/snapshots.py) plus one checkpoint pointer; every mutation is an
atomic manifest rename, so after ANY crash the on-disk state is one of
a small set of legal shapes (tables at or ahead of the checkpoint,
staged-but-unreferenced data dirs). Operators still want a tool that
PROVES a state dir is one of those shapes before resuming a
multi-week crawl on it — the Iceberg/Delta equivalent is a metadata
fsck — and that distinguishes:

- **errors** — shapes no crash can legally produce (a manifest that
  references a missing data dir, a table BEHIND the checkpoint, a
  committed bucketed base with no ``_BUCKETS`` marker): the state is
  damaged (manual copy, partial delete, bit rot) and resume would
  misbehave;
- **warnings** — legal-but-notable shapes (tables ahead of the
  checkpoint = an uncommitted round that resume will roll back;
  unreferenced ``d*`` dirs = staged garbage from a crashed write that
  the next prune/compaction may reclaim; stale ``*.tmp`` files).

Cost shape: the checker is driver-side file metadata only — it reads
each table's ``manifest.json`` (bytes, not data) and lists ONLY the
manifest-referenced directories plus each table root's first level.
On an object store that is one LIST per table root and one per
referenced dir; no data file is ever opened, no Spark job runs.

Verified against the crash-injection sweeps in tests/test_resume.py:
every state a mid-commit crash can leave fscks with zero errors.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

# (table dir name, checkpoint key) — frontier_v is a nested dict
TABLES = ("frontier", "frontier_delta", "frontier_removed",
          "scheduled", "extracted", "lineage", "bloom", "events")
_CP_KEYS = {"frontier": ("frontier_v", "base"),
            "frontier_delta": ("frontier_v", "delta"),
            "frontier_removed": ("frontier_v", "removed"),
            "scheduled": ("scheduled_v",),
            "extracted": ("extracted_v",),
            "lineage": ("lineage_v",),
            "bloom": ("bloom_v",),
            "events": ("events_v",)}


def _entry_dir(entry) -> str:
    return entry if isinstance(entry, str) else entry["dir"]


def _has_file(d: Path) -> bool:
    for _root, _dirs, files in os.walk(d):
        if any(not f.startswith(".") for f in files):
            return True
    return False


def fsck_table(table_dir: str | os.PathLike) -> dict:
    """Check ONE snapshot table dir. Returns ``{present, current,
    n_versions, referenced_dirs, orphan_dirs, errors, warnings}``."""
    d = Path(table_dir)
    rep = {"present": d.is_dir(), "current": None, "n_versions": 0,
           "versions": {}, "referenced_dirs": [], "orphan_dirs": [],
           "errors": [], "warnings": []}
    if not rep["present"]:
        return rep
    mpath = d / "manifest.json"
    if not mpath.exists():
        # a table dir with data dirs but no manifest is damage; an
        # empty dir (e.g. only _BUCKETS) is just "never committed"
        if any(p.name.startswith("d") and p.is_dir() for p in d.iterdir()):
            rep["errors"].append(f"{d.name}: data dirs but no manifest.json")
        return rep
    try:
        m = json.loads(mpath.read_text())
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        rep["errors"].append(f"{d.name}: manifest.json unreadable: {e}")
        return rep
    cur = int(m.get("current", 0))
    versions = m.get("versions", {})
    rep["current"], rep["n_versions"] = cur, len(versions)
    # callers (checkpoint/pin checks) reuse this instead of re-reading
    # the manifest — keeps the one-GET-per-table cost claim true
    rep["versions"] = {v: [_entry_dir(e) for e in entries]
                       for v, entries in versions.items()}
    if cur != 0 and str(cur) not in versions:
        rep["errors"].append(
            f"{d.name}: current version {cur} missing from manifest")
    live: set[str] = set()
    for v, entries in versions.items():
        if int(v) > cur:
            rep["errors"].append(
                f"{d.name}: version {v} is ahead of current {cur} "
                f"(rollback never leaves these)")
        for e in entries:
            name = _entry_dir(e)
            live.add(name)
            dd = d / name
            if not dd.is_dir():
                rep["errors"].append(
                    f"{d.name}: v{v} references missing dir {name}")
                continue
            parts = None if isinstance(e, str) else e.get("parts")
            if parts is None:
                if not _has_file(dd):
                    rep["errors"].append(
                        f"{d.name}: v{v} references empty dir {name}")
            else:
                for p in parts:
                    if not (dd / p).is_dir() or not _has_file(dd / p):
                        rep["errors"].append(
                            f"{d.name}: v{v} references missing/empty "
                            f"partition {name}/{p}")
    rep["referenced_dirs"] = sorted(live)
    for p in d.iterdir():
        if p.is_dir() and p.name.startswith("d") and p.name not in live:
            rep["orphan_dirs"].append(p.name)
            rep["warnings"].append(
                f"{d.name}: unreferenced dir {p.name} (staged by a "
                f"crashed write; reclaimable)")
        if p.name.endswith(".tmp"):
            rep["warnings"].append(f"{d.name}: stale temp file {p.name}")
    return rep


def fsck_state(state_dir: str | os.PathLike) -> dict:
    """Check a whole crawl state dir: every table (fsck_table), the
    checkpoint pointer, and the frontier's bucket layout. Returns
    ``{ok, errors, warnings, checkpoint, tables}`` — ``ok`` means zero
    errors (warnings alone are legal post-crash shapes that resume
    handles)."""
    root = Path(state_dir)
    out = {"ok": False, "errors": [], "warnings": [],
           "checkpoint": None, "tables": {}}
    if not root.is_dir():
        out["errors"].append(f"state dir {root} does not exist")
        return out
    for t in TABLES:
        rep = fsck_table(root / t)
        out["tables"][t] = rep
        out["errors"].extend(rep["errors"])
        out["warnings"].extend(rep["warnings"])

    cp_path = root / "checkpoint.json"
    if cp_path.with_suffix(".json.tmp").exists():
        out["warnings"].append("stale checkpoint.json.tmp")
    cp = None
    if cp_path.exists():
        try:
            cp = json.loads(cp_path.read_text())
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            out["errors"].append(f"checkpoint.json unreadable: {e}")
    out["checkpoint"] = cp
    if cp is not None:
        for t in TABLES:
            keys = _CP_KEYS[t]
            v = cp.get(keys[0])
            if len(keys) == 2:
                if isinstance(v, dict):
                    v = v.get(keys[1])
                elif v is not None:
                    # legacy pre-FrontierStore checkpoint: frontier_v
                    # is a bare int (base version only) — resume
                    # supports it (rollback(int)); delta/removed are
                    # unknowable, so only the base row is checked
                    if keys[1] != "base":
                        out["warnings"].append(
                            f"legacy int frontier_v: {t} version "
                            f"unknown (resume rolls base only)")
                        continue
            if v is None:
                # crawl.py resumes with cp.get(key, 0) — a missing key
                # is tolerated, not damage. Only worth flagging when
                # the table actually holds commits a reset would lose
                # (optional tables like `events` are absent from most
                # states and checkpoints by design).
                rep = out["tables"][t]
                if rep["present"] and (rep["current"] or 0) > 0:
                    out["warnings"].append(
                        f"checkpoint lacks version for {t} "
                        f"(resume assumes 0 — table would reset)")
                continue
            rep = out["tables"][t]
            cur = rep["current"] or 0
            if cur < v:
                # resume rolls back TO the checkpoint; a table behind
                # it cannot be rolled forward — no crash produces this
                out["errors"].append(
                    f"{t}: current v{cur} BEHIND checkpoint v{v}")
            elif cur > v:
                out["warnings"].append(
                    f"{t}: current v{cur} ahead of checkpoint v{v} "
                    f"(uncommitted round; resume rolls it back)")
            if v != 0 and rep["present"] and rep["current"] is not None:
                # rollback(v) needs the target version in the manifest
                if str(v) not in rep["versions"]:
                    out["errors"].append(
                        f"{t}: checkpoint v{v} missing from manifest "
                        f"(resume cannot roll back to it)")

    # bucketed-frontier layout: a committed base REQUIRES the marker
    # (FrontierStore.__init__ refuses to open it otherwise), and every
    # bucket partition must be < n_buckets
    fr = out["tables"]["frontier"]
    marker = root / "frontier" / "_BUCKETS"
    if fr["present"] and (fr["current"] or 0) > 0:
        if not marker.exists():
            out["errors"].append(
                "frontier: committed base without _BUCKETS marker "
                "(unopenable layout)")
        else:
            try:
                nb = int(marker.read_text())
            except ValueError:
                nb = None
                out["errors"].append("frontier: _BUCKETS marker not an int")
            if nb is not None:
                for dname in fr["referenced_dirs"]:
                    dd = root / "frontier" / dname
                    for p in dd.iterdir() if dd.is_dir() else ():
                        if p.is_dir() and p.name.startswith("bucket="):
                            try:
                                b = int(p.name.split("=", 1)[1])
                            except ValueError:
                                out["errors"].append(
                                    f"frontier: {dname}/{p.name} has a "
                                    f"non-integer bucket value")
                                continue
                            if not 0 <= b < nb:
                                out["errors"].append(
                                    f"frontier: {dname}/{p.name} outside "
                                    f"n_buckets={nb}")

    out["ok"] = not out["errors"]
    return out


def repair_state(state_dir: str | os.PathLike,
                 min_age_s: float = 3600.0,
                 dry_run: bool = False) -> dict:
    """Reclaim the two warning classes that are pure garbage: data
    dirs referenced by NO manifest version (staged by a crashed write)
    and stale ``*.tmp`` files. Never touches anything a manifest or
    the checkpoint references, and never runs when fsck reports
    ERRORS (repairing a damaged state could destroy evidence needed
    for manual recovery). ``min_age_s`` guards the single-writer
    assumption at the margin: a dir younger than it may be a LIVE
    stage of an in-flight writer, so it is skipped (pass 0 to reclaim
    everything, e.g. in tests or when the writer is known dead).

    ``dry_run=True`` walks the same decision tree but DELETES NOTHING:
    the returned ``would_repair`` lists exactly the paths (with byte
    sizes) a real repair would reclaim — operators preview before
    pointing a destructive command at a multi-week crawl state.

    Returns ``{repaired: [...], skipped_young: [...], report: fsck}``
    (real run) or ``{dry_run: True, would_repair: [{path, bytes}...],
    skipped_young: [...], report: fsck}`` — ``report`` is the
    post-repair (or unchanged, for dry-run) fsck_state output."""
    import shutil
    import time

    root = Path(state_dir)
    pre = fsck_state(root)
    if not pre["ok"]:
        raise ValueError(
            f"refusing to repair a state with errors: {pre['errors']}")

    def _tree_bytes(p: Path) -> int:
        if p.is_file():
            return p.stat().st_size
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())

    repaired, young, would = [], [], []
    now = time.time()
    for t, rep in pre["tables"].items():
        for name in rep["orphan_dirs"]:
            d = root / t / name
            if now - d.stat().st_mtime < min_age_s:
                young.append(str(d))
                continue
            if dry_run:
                would.append({"path": str(d), "bytes": _tree_bytes(d)})
                continue
            shutil.rmtree(d)
            repaired.append(str(d))
    for t in (*TABLES, "."):
        td = root / t
        if not td.is_dir():
            continue
        for p in td.iterdir():
            if p.is_file() and p.name.endswith(".tmp"):
                if now - p.stat().st_mtime < min_age_s:
                    young.append(str(p))
                    continue
                if dry_run:
                    would.append({"path": str(p), "bytes": _tree_bytes(p)})
                    continue
                p.unlink()
                repaired.append(str(p))
    if dry_run:
        return {"dry_run": True,
                "would_repair": sorted(would, key=lambda x: x["path"]),
                "reclaimable_bytes": sum(x["bytes"] for x in would),
                "skipped_young": sorted(young), "report": pre}
    return {"repaired": sorted(repaired), "skipped_young": sorted(young),
            "report": fsck_state(root)}


def _read_meta_json(table_dir: Path) -> dict | None:
    """The JSON meta row of a pointer table's CURRENT version, read
    with pyarrow (no Spark) — the one place index fsck opens data
    files; a pointer table is a handful of tiny rows by design."""
    import pyarrow.parquet as pq

    mpath = table_dir / "manifest.json"
    if not mpath.exists():
        return None
    m = json.loads(mpath.read_text())
    cur = int(m.get("current", 0))
    if cur == 0 or str(cur) not in m.get("versions", {}):
        return None
    for e in m["versions"][str(cur)]:
        d = table_dir / _entry_dir(e)
        if not d.is_dir():
            continue
        for f in sorted(d.rglob("*.parquet")):
            t = pq.read_table(f, columns=["kind", "s"])
            for kind, s in zip(t.column("kind").to_pylist(),
                               t.column("s").to_pylist()):
                if kind == "meta" and s is not None:
                    return json.loads(s)
    return None


_INDEX_PAIRS = (("_stats", "_postings", "postings_version"),
                ("_model", "_codes", "codes_version"))


def fsck_index(state_dir: str | os.PathLike, name: str) -> dict:
    """Integrity check for a build-once/query-many index pair
    (SearchIndex ``{name}_stats``/``{name}_postings`` or AnnIndex
    ``{name}_model``/``{name}_codes``): both tables pass fsck_table,
    and the pointer table's meta row pins a data-table version that
    actually EXISTS in the data manifest. A data table AHEAD of the
    pin is the legal crash-between-commits shape (the old consistent
    pairing is served); a pin pointing at a pruned/missing version is
    damage — opening the index would fail or silently serve the wrong
    pairing."""
    root = Path(state_dir)
    out = {"ok": False, "name": name, "errors": [], "warnings": [],
           "tables": {}}
    pair = next((p for p in _INDEX_PAIRS
                 if (root / f"{name}{p[0]}").is_dir()), None)
    if pair is None:
        out["errors"].append(
            f"no index named {name!r} under {root} (neither "
            f"{name}_stats nor {name}_model exists)")
        return out
    ptr_sfx, data_sfx, pin_key = pair
    ptr_rep = fsck_table(root / f"{name}{ptr_sfx}")
    data_rep = fsck_table(root / f"{name}{data_sfx}")
    out["tables"] = {f"{name}{ptr_sfx}": ptr_rep,
                     f"{name}{data_sfx}": data_rep}
    for rep in (ptr_rep, data_rep):
        out["errors"].extend(rep["errors"])
        out["warnings"].extend(rep["warnings"])
    if (ptr_rep["current"] or 0) == 0:
        out["errors"].append(f"{name}: pointer table never committed "
                             f"(index unbuilt or damaged)")
        out["ok"] = not out["errors"]
        return out
    meta = _read_meta_json(root / f"{name}{ptr_sfx}")
    if meta is None:
        out["errors"].append(f"{name}: no meta row in the committed "
                             f"pointer table")
    else:
        pin = meta.get(pin_key)
        data_cur = data_rep["current"] or 0
        if pin is None:
            if ptr_sfx == "_stats":
                # SearchIndex.__init__ reads meta["postings_version"]
                # unconditionally — an unpinned stats row cannot open
                out["errors"].append(
                    f"{name}: meta lacks {pin_key} (the index will "
                    f"fail to open)")
            else:
                # AnnIndex has the legacy .get fallback: opens latest
                out["warnings"].append(
                    f"{name}: meta lacks {pin_key} (legacy unpinned "
                    f"index — opens at the latest data version)")
        else:
            versions = data_rep["versions"]
            if str(pin) not in versions:
                out["errors"].append(
                    f"{name}: pinned {pin_key} {pin} missing from the "
                    f"data manifest (pruned past the pin?)")
            elif data_cur > pin:
                out["warnings"].append(
                    f"{name}: data table v{data_cur} ahead of pin "
                    f"v{pin} (crash between commits; the old pairing "
                    f"is served)")
    out["ok"] = not out["errors"]
    return out
