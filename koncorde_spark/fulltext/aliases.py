"""Index aliases: named pointers to index directories, flipped atomically.

The zero-downtime reindex pattern (Elasticsearch aliases): writers build
or compact into a NEW directory, then flip the alias; every subsequent
open resolves the alias to the new index. This is the operational answer
to the reader-reopen contract (compact_index docstring): instead of
rewriting a live directory under open handles, flip a pointer and let
each query tier re-resolve at open time.

Layout: ``<root>/aliases.json`` maps alias name → {"target": <dir>,
"updated": <monotonic generation>}, plus a reserved ``__gen__`` entry
persisting the counter so generations stay strictly monotonic across
drops. The flip is write-staged-then-rename
— the same primitive the index swaps use — so a reader never observes a
torn file; generations make stale-write detection possible for external
tooling. All I/O goes through fulltext.fs (Hadoop FS for scheme-carrying
roots, plain files locally).
"""

from __future__ import annotations

from . import fs

ALIASES_FILE = "aliases.json"


def _aliases_path(root: str) -> str:
    return root.rstrip("/") + "/" + ALIASES_FILE


# reserved top-level key carrying the monotonic generation counter —
# kept in the same JSON so a drop cannot regress generations (max over
# surviving entries would)
_GEN_KEY = "__gen__"


def _read_raw(root: str) -> dict:
    p = _aliases_path(root)
    return fs.read_json(p) if fs.exists(p) else {}


def read_aliases(root: str) -> dict:
    """{alias: {"target": dir, "updated": gen}} — empty if none set."""
    return {k: v for k, v in _read_raw(root).items() if k != _GEN_KEY}


def set_alias(root: str, name: str, target_dir: str) -> dict:
    """Point ``name`` at ``target_dir`` (create or flip), atomically:
    the updated mapping is staged to a temp file and renamed over the
    live one. Returns the new mapping entry.

    Concurrency contract: flips are atomic for READERS (never torn JSON),
    but the store is last-writer-wins across concurrent WRITERS — like an
    index build, alias administration assumes one writer at a time (ES
    routes alias updates through one master for the same reason). Names
    may not contain '/', '#' or ',' (reserved by the alias:<root>#<name>
    CLI spec and the comma-separated --index list)."""
    if not name or any(c in name for c in "/#,") or name == _GEN_KEY:
        raise ValueError(f"invalid alias name: {name!r}")
    raw = _read_raw(root)
    # the persisted counter survives drops, so generations are strictly
    # monotonic across the store's whole history (a flip after a drop can
    # never carry a lower generation than one an observer already saw)
    gen = (
        max(
            int(raw.get(_GEN_KEY, 0)),
            *(int(a.get("updated", 0)) for k, a in raw.items() if k != _GEN_KEY),
            0,
        )
        + 1
    )
    raw[name] = {"target": target_dir, "updated": gen}
    raw[_GEN_KEY] = gen
    _write_staged(root, raw)
    return raw[name]


def drop_alias(root: str, name: str) -> None:
    raw = _read_raw(root)
    if name not in raw or name == _GEN_KEY:
        raise KeyError(f"alias not found: {name!r}")
    del raw[name]
    _write_staged(root, raw)


def resolve_alias(root: str, name: str) -> str:
    """The directory ``name`` currently points at. Raises KeyError for
    an unknown alias (callers should not fall back silently — a typo'd
    alias resolving to nothing must be loud)."""
    aliases = read_aliases(root)
    if name not in aliases:
        raise KeyError(f"alias not found: {name!r} (root {root})")
    return aliases[name]["target"]


def _write_staged(root: str, aliases: dict) -> None:
    import json
    import os
    import uuid

    live = _aliases_path(root)
    # unique staged name: two writers racing (outside the single-writer
    # contract) must at worst last-writer-win, never rename each other's
    # half-written stage
    staged = f"{live}.staged-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    fs.write_text(staged, json.dumps(aliases, indent=1, sort_keys=True))
    if fs.is_local(live):
        # os.replace: atomic overwrite, no absence window
        fs.rename(staged, live)
        return
    # HDFS rename refuses an existing destination: delete first. The
    # sub-millisecond absence window degrades a concurrent read to
    # "no aliases yet" (KeyError at resolve), never to torn JSON.
    if fs.exists(live):
        fs.delete(live, recursive=False)
    fs.rename(staged, live)


def resolve_spec(entry: str) -> str:
    """``alias:<root>#<name>`` → the aliased dir; anything else verbatim.
    The one spec parser every CLI shares."""
    if not entry.startswith("alias:"):
        return entry
    spec = entry[len("alias:"):]
    root, sep, name = spec.rpartition("#")
    if not sep or not root or not name:
        raise ValueError(f"bad alias spec {entry!r}: want alias:<root>#<name>")
    return resolve_alias(root, name)


def open_index(spark, root: str, name: str):
    """Resolve and open the job-tier handle the alias points at."""
    from .query import Bm25Index

    return Bm25Index(spark, resolve_alias(root, name))


def open_local(root: str, name: str):
    """Resolve and open the serving-tier handle (Spark-free)."""
    from .serve import LocalSearcher

    return LocalSearcher(resolve_alias(root, name))
