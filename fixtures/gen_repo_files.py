"""Deterministic synthetic `repo_files` fixture with planted entity clusters.

Spec: FIXTURES.md §A (shape from BASELINE.json:15 input_hint). Seeded
(seed=42), pure numpy/python — no external data, no wall-clock. The planted
entity partition is the golden clustering for the end-to-end test and the F1
gate (BASELINE.json:2).

Variant construction per entity (FIXTURES.md §A1):
- exact duplicate: identical content, different repo/commit;
- near-duplicate name: basename edit (char swap / suffix change), identical
  content;
- token perturbation: ≤10% of content tokens replaced — still above the match
  threshold.
Hard negatives arise naturally: all rows draw from one shared code-token
vocabulary, and distinct entities reuse basename stems with different numeric
suffixes (adjacent sorted-neighborhood keys).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42

SIZES = {"tiny": 200, "small": 5000, "bench": 100_000}

LANGS = ["py", "java", "scala", "c", "go", "js"]
EXT = {"py": "py", "java": "java", "scala": "scala", "c": "c", "go": "go", "js": "js"}

# Code-ish vocabulary (content tokens): a small COMMON core (keywords,
# builtins — high document frequency, dropped by the hot-key cap at blocking
# time) plus a RARE identifier tail whose size scales with corpus size, like
# identifiers in real code corpora. Blocking signal comes from rare tokens.
_VOCAB_STEMS = [
    "parse", "token", "lexer", "emit", "node", "tree", "hash", "join", "merge",
    "sort", "scan", "index", "batch", "row", "column", "schema", "field",
    "buffer", "stream", "read", "write", "open", "close", "flush", "seek",
    "alloc", "free", "init", "config", "option", "flag", "value", "key",
    "entry", "map", "list", "array", "queue", "stack", "heap", "graph",
    "edge", "vertex", "label", "score", "match", "block", "pair", "record",
    "entity", "cluster", "filter", "reduce", "fold", "apply", "invoke",
    "call", "result", "error", "raise", "catch", "retry", "timeout",
    "thread", "lock", "mutex", "atomic", "state", "cache", "evict",
    "partition", "shuffle", "spill", "codegen", "plan", "stage", "task",
]
COMMON_VOCAB = [f"{s}{i}" for s in _VOCAB_STEMS for i in range(8)]  # 576 tokens
RARE_FRACTION = 0.3  # fraction of content drawn from the rare identifier tail


def _rare_vocab(n_rows: int) -> list[str]:
    # ~8 ids per row keeps per-token document frequency ~4 at any scale.
    n = 8 * max(n_rows, 2500)
    return [f"id_{i:06x}" for i in range(n)]

# Basename stems (file "titles") — deliberately reused across entities so
# unrelated files land adjacent in sorted-neighborhood order (hard negatives).
NAME_STEMS = [
    "utils", "parser", "join_impl", "hash_table", "scanner", "codegen",
    "planner", "executor", "buffer_pool", "string_ops", "array_ops",
    "shuffle_mgr", "block_cache", "token_stream", "record_reader",
    "metrics", "config_loader", "checkpoint", "similarity", "cluster_cc",
]


@dataclass
class RepoFilesFixture:
    records: pd.DataFrame       # repo,path,commit,lang,content
    golden: pd.DataFrame        # rid, entity_id (planted partition)
    labeled_pairs: pd.DataFrame  # rid1, rid2, is_match, block_key


def _rid(repo: str, path: str, commit: str) -> str:
    return hashlib.sha256(f"{repo}\x1f{path}\x1f{commit}".encode()).hexdigest()


def _commit(seed: int, i: int) -> str:
    return hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()  # 40-char sha-like


def _swap_chars(name: str, pos: int) -> str:
    if len(name) < 3:
        return name + "x"
    pos = pos % (len(name) - 1)
    lst = list(name)
    lst[pos], lst[pos + 1] = lst[pos + 1], lst[pos]
    return "".join(lst)


def generate(n_rows: int, seed: int = SEED, hot_key: bool = False) -> RepoFilesFixture:
    rng = np.random.default_rng(seed)
    rare = np.array(_rare_vocab(n_rows))
    common = np.array(COMMON_VOCAB)

    def draw_tokens(k: int) -> np.ndarray:
        is_rare = rng.random(k) < RARE_FRACTION
        out = common[rng.integers(len(common), size=k)].astype(object)
        n_r = int(is_rare.sum())
        if n_r:
            out[is_rare] = rare[rng.integers(len(rare), size=n_r)]
        return out

    # --- plant the entity partition: cluster sizes 1..6 -------------------
    sizes = []
    total = 0
    while total < n_rows:
        s = int(rng.choice([1, 1, 1, 2, 2, 3, 4, 5, 6]))
        s = min(s, n_rows - total)
        sizes.append(s)
        total += s

    rows: list[dict] = []
    golden: list[dict] = []
    i = 0
    for eid, size in enumerate(sizes):
        lang = LANGS[int(rng.integers(len(LANGS)))]
        stem = NAME_STEMS[int(rng.integers(len(NAME_STEMS)))]
        base = f"{stem}_{int(rng.integers(100))}"
        n_tok = int(rng.integers(20, 201))
        canon = draw_tokens(n_tok).tolist()
        entity_key = f"e{eid:07d}"
        for m in range(size):
            repo = f"org{(i * 7 + m) % 37}/proj{(i * 11 + m) % 101}"
            commit = _commit(seed, i)
            dirseg = f"src/{stem.split('_')[0]}"
            name = base
            tokens = canon
            if m == 1:  # exact duplicate, different repo/commit
                pass
            elif m == 2:  # near-duplicate name, identical content
                name = _swap_chars(base, int(rng.integers(len(base))))
            elif m >= 3:  # token-level perturbation ≤10%
                tokens = list(canon)
                k = max(1, int(0.08 * len(tokens)))
                idx = rng.choice(len(tokens), size=k, replace=False)
                repl = draw_tokens(k)
                for j, t in zip(idx, repl):
                    tokens[int(j)] = str(t)
            path = f"{dirseg}/{name}.{EXT[lang]}"
            content = " ".join(tokens)
            rows.append(
                dict(repo=repo, path=path, commit=commit, lang=lang, content=content)
            )
            golden.append(
                dict(rid=_rid(repo, path, commit), entity_id=entity_key)
            )
            i += 1

    if hot_key:
        # FIXTURES.md §A3: pathological hot token — 2000 singleton rows all
        # containing "license" and near-identical basenames.
        for h in range(2000):
            repo = f"hot{h % 13}/lic{h % 29}"
            commit = _commit(seed + 1, h)
            filler = draw_tokens(30).tolist()
            content = "license copyright permission notice " + " ".join(filler)
            path = f"docs/license_{h % 7}.txt"
            rows.append(
                dict(repo=repo, path=path, commit=commit, lang="txt", content=content)
            )
            golden.append(
                dict(rid=_rid(repo, path, commit), entity_id=f"hot{h:05d}")
            )

    records = pd.DataFrame(rows)
    golden_df = pd.DataFrame(golden)
    labeled = _labeled_pairs(records, golden_df, rng)
    return RepoFilesFixture(records=records, golden=golden_df, labeled_pairs=labeled)


def _content_tokens(content: str) -> set[str]:
    return {t for t in content.lower().split() if len(t) >= 2}


def _labeled_pairs(
    records: pd.DataFrame, golden: pd.DataFrame, rng: np.random.Generator
) -> pd.DataFrame:
    """FIXTURES.md §A2 — positives: all intra-entity pairs; negatives: seeded
    same-block (shared-token) pairs at ≥10:1."""
    recs = records.copy()
    recs["rid"] = golden["rid"].values
    recs["entity_id"] = golden["entity_id"].values
    recs["tokset"] = recs["content"].map(_content_tokens)

    pairs: list[dict] = []
    # positives
    for _, grp in recs.groupby("entity_id"):
        ids = sorted(grp["rid"].tolist())
        toksets = dict(zip(grp["rid"], grp["tokset"]))
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                shared = toksets[ids[a]] & toksets[ids[b]]
                if not shared:
                    continue  # not same-block → out of metric scope
                pairs.append(
                    dict(
                        rid1=ids[a],
                        rid2=ids[b],
                        is_match=True,
                        block_key=min(shared),
                    )
                )
    n_pos = len(pairs)

    # negatives: sample row pairs sharing ≥1 token but different entity
    n_neg_target = max(10 * n_pos, 100)
    n = len(recs)
    rid_arr = recs["rid"].values
    ent_arr = recs["entity_id"].values
    tok_arr = recs["tokset"].values
    seen: set[tuple[str, str]] = set()
    attempts = 0
    while len(pairs) - n_pos < n_neg_target and attempts < 50 * n_neg_target:
        attempts += 1
        a, b = int(rng.integers(n)), int(rng.integers(n))
        if a == b or ent_arr[a] == ent_arr[b]:
            continue
        shared = tok_arr[a] & tok_arr[b]
        if not shared:
            continue
        r1, r2 = sorted((rid_arr[a], rid_arr[b]))
        if (r1, r2) in seen:
            continue
        seen.add((r1, r2))
        pairs.append(dict(rid1=r1, rid2=r2, is_match=False, block_key=min(shared)))

    return pd.DataFrame(pairs)


def write_fixture(out_dir: str, size: str = "small", hot_key: bool = False) -> None:
    """Materialize records/golden/labeled_pairs as parquet under out_dir."""
    import os

    fx = generate(SIZES[size], hot_key=hot_key)
    os.makedirs(out_dir, exist_ok=True)
    fx.records.to_parquet(f"{out_dir}/repo_files.parquet", index=False)
    fx.golden.to_parquet(f"{out_dir}/golden.parquet", index=False)
    fx.labeled_pairs.to_parquet(f"{out_dir}/labeled_pairs.parquet", index=False)


if __name__ == "__main__":
    import sys

    out = sys.argv[1]
    size = sys.argv[2] if len(sys.argv) > 2 else "small"
    hot = len(sys.argv) > 3 and sys.argv[3] == "hot"
    write_fixture(out, size, hot)
    print(f"wrote {size} fixture to {out}")
