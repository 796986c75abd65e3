"""Deterministic CDC fixture generator + single-threaded oracle.

Synthesizes the `input_hint` table shape — source-code repository content
``(repo, path, commit, lang, content)`` — plus an LSN-ordered change-event log
(insert / update / delete / schema_change), per FIXTURES.md §1-2:

- duplicate keys within an epoch (exercises last-writer-wins dedup),
- delete-then-reinsert sequences,
- updates to never-inserted keys (upsert semantics),
- >=1 hot monorepo carrying ~`hot_factor`x the path mass (skew fixture),
- un-normalized ``lang`` variants ("Python", "py") for the normalization UDF.

Everything is seeded (`random.Random(seed)`), no wall-clock anywhere, so
repeated generation is bit-for-bit identical — the north-star requires
reproducibility from any checkpoint.

The oracle (`oracle_final_state`) is the trivially-correct applier the
reference pipeline's semantics reduce to: a dict keyed by (repo, path) with
events applied in LSN order (reference semantics: MySQL `ON DUPLICATE KEY
UPDATE`, hdata-jdbc/.../writer/jdbc/JDBCWriter.java:128-145, fed by the
LSN-ordered Kafka tail, hdata-kafka/.../reader/kafka/KafkaConsumer.java:95-137).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

import pandas as pd

LANG_VARIANTS = {
    "python": ["python", "Python", "py", "PYTHON"],
    "java": ["java", "Java", "JAVA"],
    "go": ["go", "Go", "golang"],
    "rust": ["rust", "Rust", "rs"],
    "javascript": ["javascript", "JavaScript", "js", "JS"],
}
CANONICAL_LANGS = sorted(LANG_VARIANTS)

_WORDS = (
    "def class return import from for while if else try except with lambda "
    "yield async await public static void int long string bool match struct "
    "impl trait fn let mut const var func package interface map chan select"
).split()


@dataclass
class CDCFixtureConfig:
    seed: int = 42
    n_repos: int = 20
    paths_per_repo: int = 30
    hot_repos: int = 1
    hot_factor: int = 20  # hot repos carry hot_factor * paths_per_repo paths
    n_events: int = 5_000
    epoch_size: int = 1_000
    base_rows: int = 200  # initial target-table rows (pre-existing state)
    delete_frac: float = 0.10
    insert_frac: float = 0.35  # of data events, targeting possibly-new keys
    schema_changes: tuple = ()  # e.g. (("add","stars","int"), ("rename","stars","stargazers"), ("widen","stargazers","bigint"))
    content_tokens: int = 30

    @property
    def n_epochs(self) -> int:
        return (self.n_events + self.epoch_size - 1) // self.epoch_size


def _repo_name(i: int) -> str:
    return f"org{i % 7}/repo{i}"


def _content(rng: random.Random, n_tokens: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_tokens))


def _commit(repo: str, path: str, lsn: int) -> str:
    return hashlib.sha1(f"{repo}|{path}|{lsn}".encode()).hexdigest()


def _key_universe(cfg: CDCFixtureConfig) -> list[tuple[str, str]]:
    """All (repo, path) keys; hot repos get hot_factor x the paths."""
    keys: list[tuple[str, str]] = []
    for i in range(cfg.n_repos):
        repo = _repo_name(i)
        n_paths = cfg.paths_per_repo * (cfg.hot_factor if i < cfg.hot_repos else 1)
        for k in range(n_paths):
            ext = ["py", "java", "go", "rs", "js"][k % 5]
            keys.append((repo, f"src/m{k % 10}/f_{k}.{ext}"))
    return keys


def _lang_for_path(path: str) -> str:
    ext = path.rsplit(".", 1)[-1]
    return {"py": "python", "java": "java", "go": "go", "rs": "rust", "js": "javascript"}[ext]


def generate_base(cfg: CDCFixtureConfig) -> pd.DataFrame:
    """Initial target-table state (canonical langs, pre-replay)."""
    rng = random.Random(cfg.seed * 7 + 1)
    keys = _key_universe(cfg)
    chosen = rng.sample(keys, min(cfg.base_rows, len(keys)))
    rows = [
        {
            "repo": repo,
            "path": path,
            "commit": _commit(repo, path, 0),
            "lang": _lang_for_path(path),
            "content": _content(rng, cfg.content_tokens),
        }
        for repo, path in sorted(chosen)
    ]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_events(cfg: CDCFixtureConfig) -> pd.DataFrame:
    """LSN-ordered change-event log (strictly increasing lsn, monotone epochs).

    Vectorized with numpy (seeded PCG64) so multi-million-event bench
    fixtures generate in seconds; still fully deterministic per config.
    """
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(cfg.seed * 13 + 2))
    keys = _key_universe(cfg)
    n = cfg.n_events

    lsn = np.arange(1, n + 1, dtype=np.int64)
    epoch = (lsn - 1) // cfg.epoch_size
    r = rng.random(n)
    key_idx = rng.integers(0, len(keys), size=n)
    is_delete = r < cfg.delete_frac
    is_insert = (~is_delete) & (r < cfg.delete_frac + cfg.insert_frac)

    repos = np.array([k[0] for k in keys], dtype=object)
    paths = np.array([k[1] for k in keys], dtype=object)
    repo_col = repos[key_idx]
    path_col = paths[key_idx]

    # commit = deterministic 40-hex mix of (key, lsn). The oracle never
    # recomputes commits (it reads them from the event), so only determinism
    # matters — a splitmix-style integer mix is ~100x faster than per-row sha1.
    mix1 = (key_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        lsn.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    mix2 = (mix1 ^ (mix1 >> np.uint64(31))) * np.uint64(0x94D049BB133111EB)
    commit_col = np.array(
        [
            None if d else f"{a:016x}{b:016x}{(int(a) ^ int(b)) & 0xFFFFFFFF:08x}"
            for d, a, b in zip(is_delete, mix1, mix2)
        ],
        dtype=object,
    )
    # lang: a seeded variant of the path's canonical lang
    variant_pick = rng.integers(0, 4, size=n)
    lang_col = np.array(
        [
            None
            if d
            else (lambda v: v[int(i) % len(v)])(LANG_VARIANTS[_lang_for_path(pa)])
            for d, pa, i in zip(is_delete, path_col, variant_pick)
        ],
        dtype=object,
    )
    # content: seeded sentence pool + unique tail (pool join is O(pool), the
    # per-event work is one concat — generates 10^7 events in seconds)
    pool_rng = np.random.Generator(np.random.PCG64(cfg.seed * 19 + 3))
    pool = np.array(
        [
            " ".join(
                _WORDS[i]
                for i in pool_rng.integers(0, len(_WORDS), size=cfg.content_tokens)
            )
            for _ in range(1024)
        ],
        dtype=object,
    )
    sent_idx = rng.integers(0, len(pool), size=n)
    content_col = np.array(
        [
            None if d else f"{s} #{a:016x}"
            for d, s, a in zip(is_delete, pool[sent_idx], mix1)
        ],
        dtype=object,
    )

    op_col = np.where(
        is_delete, "delete", np.where(is_insert, "insert", "update")
    ).astype(object)

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "epoch": epoch,
            "op": op_col,
            "repo": repo_col,
            "path": path_col,
            "commit": commit_col,
            "lang": lang_col,
            "content": content_col,
            "sc_kind": None,
            "sc_column": None,
            "sc_arg": None,
        }
    )
    df["sc_kind"] = df["sc_kind"].astype(object)
    df["sc_column"] = df["sc_column"].astype(object)
    df["sc_arg"] = df["sc_arg"].astype(object)

    # overlay schema-change events at seeded LSNs (tiny count, python loop ok)
    if cfg.schema_changes:
        py_rng = random.Random(cfg.seed * 17 + 5)
        schema_lsns = sorted(py_rng.sample(range(1, n), len(cfg.schema_changes)))
        for ls, (kind, column, arg) in zip(schema_lsns, cfg.schema_changes):
            i = ls - 1
            df.loc[i, ["op", "repo", "path", "commit", "lang", "content"]] = [
                "schema_change", None, None, None, None, None,
            ]
            df.loc[i, ["sc_kind", "sc_column", "sc_arg"]] = [kind, column, arg]
    return df


def normalize_lang(lang: str | None) -> str | None:
    """Canonical form of a lang label (oracle-side mirror of functions.text)."""
    if lang is None:
        return None
    low = lang.strip().lower()
    for canonical, variants in LANG_VARIANTS.items():
        if low == canonical or low in {v.lower() for v in variants}:
            return canonical
    return low


def oracle_final_state(
    base: pd.DataFrame, events: pd.DataFrame, upto_lsn: int | None = None
) -> pd.DataFrame:
    """Single-threaded reference applier: dict keyed (repo, path), LSN order.

    Insert and update are both upserts (reference: ON DUPLICATE KEY UPDATE);
    delete removes the key; schema_change does not touch row state. ``lang``
    is normalized on apply (the engine's vectorized UDF does the same).
    """
    state: dict[tuple[str, str], dict] = {
        (r.repo, r.path): {
            "repo": r.repo, "path": r.path, "commit": r.commit,
            "lang": r.lang, "content": r.content,
        }
        for r in base.itertuples()
    }
    ev = events.sort_values("lsn")
    if upto_lsn is not None:
        ev = ev[ev["lsn"] <= upto_lsn]
    for e in ev.itertuples():
        if e.op == "schema_change":
            continue
        key = (e.repo, e.path)
        if e.op == "delete":
            state.pop(key, None)
        else:  # insert | update — both upsert
            state[key] = {
                "repo": e.repo, "path": e.path, "commit": e.commit,
                "lang": normalize_lang(e.lang), "content": e.content,
            }
    out = pd.DataFrame(
        sorted(state.values(), key=lambda d: (d["repo"], d["path"])),
        columns=["repo", "path", "commit", "lang", "content"],
    )
    return out


def sha256_fingerprint(df: pd.DataFrame) -> str:
    """Order-insensitive sha256 of (repo, path, commit, lang, sha256(content))."""
    rows = sorted(
        (
            r.repo,
            r.path,
            r.commit,
            r.lang,
            hashlib.sha256((r.content or "").encode()).hexdigest(),
        )
        for r in df.itertuples()
    )
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join("" if v is None else str(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def write_fixture(out_dir: str, cfg: CDCFixtureConfig) -> dict[str, str]:
    """Write base + events parquet into out_dir; returns paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    base = generate_base(cfg)
    events = generate_events(cfg)
    base_path = os.path.join(out_dir, "base.parquet")
    events_path = os.path.join(out_dir, "events.parquet")
    # Small row groups: (a) Spark scan splits cannot exceed row-group
    # boundaries, so this sets the scan parallelism ceiling; (b) the monotone
    # epoch column becomes row-group-prunable for per-epoch reads.
    # compression=None: synthetic text compresses unrealistically well, which
    # would shrink file bytes and cap Spark's scan-split parallelism; raw
    # bytes keep split planning honest (real 100 TB corpora have entropy).
    base.to_parquet(base_path, index=False, row_group_size=50_000)
    events.to_parquet(
        events_path, index=False, row_group_size=50_000, compression=None
    )
    return {"base": base_path, "events": events_path}
