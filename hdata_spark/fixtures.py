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
    """LSN-ordered change-event log (strictly increasing lsn, monotone epochs)."""
    rng = random.Random(cfg.seed * 13 + 2)
    keys = _key_universe(cfg)
    # Weight choices toward hot repos: key_universe already over-represents them.
    n_schema = len(cfg.schema_changes)
    schema_lsns = (
        sorted(rng.sample(range(1, cfg.n_events), n_schema)) if n_schema else []
    )
    schema_iter = iter(zip(schema_lsns, cfg.schema_changes))
    next_schema = next(schema_iter, None)

    rows = []
    for lsn in range(1, cfg.n_events + 1):
        epoch = (lsn - 1) // cfg.epoch_size
        if next_schema is not None and lsn == next_schema[0]:
            kind, column, arg = next_schema[1]
            rows.append(
                {
                    "lsn": lsn,
                    "epoch": epoch,
                    "op": "schema_change",
                    "repo": None,
                    "path": None,
                    "commit": None,
                    "lang": None,
                    "content": None,
                    "sc_kind": kind,
                    "sc_column": column,
                    "sc_arg": arg,  # new_name for rename, new_type for add/widen
                }
            )
            next_schema = next(schema_iter, None)
            continue
        r = rng.random()
        repo, path = rng.choice(keys)
        if r < cfg.delete_frac:
            op, commit, lang, content = "delete", None, None, None
        else:
            op = "insert" if r < cfg.delete_frac + cfg.insert_frac else "update"
            commit = _commit(repo, path, lsn)
            canonical = _lang_for_path(path)
            lang = rng.choice(LANG_VARIANTS[canonical])
            content = _content(rng, cfg.content_tokens)
        rows.append(
            {
                "lsn": lsn,
                "epoch": epoch,
                "op": op,
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "sc_kind": None,
                "sc_column": None,
                "sc_arg": None,
            }
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "lsn", "epoch", "op", "repo", "path", "commit", "lang", "content",
            "sc_kind", "sc_column", "sc_arg",
        ],
    )
    df["lsn"] = df["lsn"].astype("int64")
    df["epoch"] = df["epoch"].astype("int64")
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
    base.to_parquet(base_path, index=False)
    events.to_parquet(events_path, index=False)
    return {"base": base_path, "events": events_path}
