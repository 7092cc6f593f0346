#!/usr/bin/env python3
"""Regenerate the synthetic corpora behind SURVEY §5b's scale probes.

Each probe writes a parquet table (schema-compatible with the
driver-generated testdata) into a target directory that
`runMain graft.ScaleProbe <dir> ...` can consume:

  python3 scripts/gen_scale_probes.py embeddings /tmp/scale_emb
      20k 64-dim vectors: random gaussian corpus + 1000 planted
      near-duplicates (cos ~ 0.96) of earlier vectors.
  python3 scripts/gen_scale_probes.py documents /tmp/scale_docs
      50k 60-word docs over a 5k-word vocab + 2000 planted near-dups
      (~10% of words mutated).
  python3 scripts/gen_scale_probes.py events /tmp/scale_events
      5M events (nanos timestamps, 15k users, 5 types, JSON props).

All generators are seeded — identical corpora on every run.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen_embeddings(out: str) -> None:
    rng = np.random.default_rng(7)
    n, d = 20000, 64
    base = rng.normal(0, 1, (n, d)).astype(np.float32)
    dup_idx = rng.choice(n // 2, 1000, replace=False)
    for k, src in enumerate(dup_idx):
        base[n - 1000 + k] = base[src] + rng.normal(0, 0.25, d).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
    })
    pq.write_table(t, f"{out}/embeddings.parquet")


def gen_documents(out: str) -> None:
    rng = np.random.default_rng(11)
    n = 50000
    vocab = [f"w{i}" for i in range(5000)]
    docs = [" ".join(rng.choice(vocab, 60)) for _ in range(n - 2000)]
    for src in rng.choice(n - 2000, 2000, replace=False):
        w = docs[src].split(" ")
        for _ in range(6):
            w[rng.integers(0, len(w))] = vocab[rng.integers(0, len(vocab))]
        docs.append(" ".join(w))
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(docs),
        "lang": pa.array(rng.choice(["en", "es", "de", "fr"], n)),
        "source": pa.array(rng.choice(["web", "books", "code"], n)),
        "n_chars": pa.array(np.array([len(x) for x in docs], dtype=np.int64)),
    })
    pq.write_table(t, f"{out}/documents.parquet")


def gen_gmm(out: str, c: int = 64) -> None:
    """200k 64-dim vectors from a c-component gaussian mixture
    (centers ~ N(0, I), within-cluster std 0.7 — moderate overlap, so
    cell boundaries matter and nprobe is a real recall knob). The
    CLUSTERED counterpart of gen_embeddings' iid corpus: IVFADC's
    residual coding should beat flat PQ at equal code budget here, and
    recall should rise with nprobe (VERDICT r15 item 2 / r16 item 4).
    `label` carries the true mixture component."""
    rng = np.random.default_rng(23)
    n, d = 200000, 64
    centers = rng.normal(0, 1, (c, d))
    comp = rng.integers(0, c, n)
    base = (centers[comp] + rng.normal(0, 0.7, (n, d))).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base), type=pa.list_(pa.float32())),
        "label": pa.array(comp.astype(np.int32)),
    })
    pq.write_table(t, f"{out}/embeddings.parquet")


def gen_events(out: str) -> None:
    rng = np.random.default_rng(5)
    n = 5_000_000
    eid = np.arange(n, dtype=np.int64)
    base = np.int64(1704067200_000_000_000)  # 2024-01-01 in ns
    ts = base + (eid * np.int64(432_000_000)) + rng.integers(0, 10**9, n)
    t = pa.table({
        "event_id": eid,
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": rng.integers(0, 15000, n).astype(np.int64),
        "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
            rng.integers(0, 5, n)],
        "value": np.round(rng.exponential(20.0, n), 2),
        "props": np.array([f'{{"k": {k}}}' for k in range(100)])[
            rng.integers(0, 100, n)],
    })
    pq.write_table(t, f"{out}/events.parquet")


def gen_zipf(out: str, s: float = 1.5) -> None:
    """5M events with a zipf(s) user distribution — the reference's
    hot-device reality (one device fanning every message into the same
    filters). At s=1.5 the hottest user carries ~38% of all rows, so the
    per-user shuffle partition is genuinely skewed (SURVEY §5 salting /
    AQE-skew claims are probed against this corpus, not asserted)."""
    rng = np.random.default_rng(13)
    n, n_user = 5_000_000, 15_000
    eid = np.arange(n, dtype=np.int64)
    base = np.int64(1704067200_000_000_000)  # 2024-01-01 in ns
    ts = base + (eid * np.int64(432_000_000)) + rng.integers(0, 10**9, n)
    users = np.minimum(rng.zipf(s, n) - 1, n_user - 1).astype(np.int64)
    hot = (users == 0).mean()
    t = pa.table({
        "event_id": eid,
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": users,
        "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
            rng.integers(0, 5, n)],
        "value": np.round(rng.exponential(20.0, n), 2),
        "props": np.array([f'{{"k": {k}}}' for k in range(100)])[
            rng.integers(0, 100, n)],
    })
    pq.write_table(t, f"{out}/events.parquet")
    print(f"  hottest user share: {hot:.1%}")


if __name__ == "__main__":
    kind, out = sys.argv[1], sys.argv[2]
    import os
    os.makedirs(out, exist_ok=True)
    if kind == "zipf":
        gen_zipf(out, float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
    else:
        {"embeddings": gen_embeddings, "documents": gen_documents,
         "events": gen_events, "gmm": gen_gmm}[kind](out)
    print(f"wrote {kind} -> {out}")
