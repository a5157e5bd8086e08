"""Generate the sf1 bench tables (10x sf0.1) under ``.data/sf1/``.

The driver ships sf{0.001,0.01,0.1} read-only; the VERDICT-r5 directive
asks for a measured (not argued) sf0.1 -> sf1 scaling point on the
expensive-tier queries, which touch only ``documents``, ``embeddings``
and ``events``. This script synthesizes those three tables at 10x with
the SAME marginal distributions as the shipped sf0.1 (measured with
DuckDB before writing this):

- documents: 50,000 rows; token text drawn from sf0.1's empirical
  31-word vocabulary with its empirical frequencies; length uniform
  [10, 100] (sf0.1: min 10 / avg 54.1 / max 100); lang and source drawn
  at sf0.1's empirical shares; ~0.16% exact-duplicate rate (sf0.1
  measured 0.16%).
- embeddings: 20,000 rows; dim 64; 10 spherical clusters (unit-norm
  centers, sigma 0.2 noise, re-normalized) matching sf0.1's 10 roughly
  equal labels.
- events: 1,000,000 rows over the same 30-day window (2024-01) with 10x
  the users (15,000) so PER-USER density — what sessionize/stateful
  state size tracks — stays constant, which is how a bigger day of
  traffic actually scales.

Deterministic (numpy PCG64 seed 42). Idempotent: skips tables that
already exist. Row counts scale linearly so a query scaling worse than
10x in wall-clock is the operator's doing, not the data's.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".data", "sf1")

N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000
N_USERS = 15_000
DUP_RATE = 0.0016


def _empirical_docs_profile() -> tuple[list[str], np.ndarray, list[str], np.ndarray]:
    import duckdb

    con = duckdb.connect()
    vocab_rows = con.execute(
        f"""SELECT token, COUNT(*) AS c FROM (
               SELECT unnest(string_split(text, ' ')) AS token
               FROM read_parquet('{SRC}/documents.parquet'))
            GROUP BY token ORDER BY token"""
    ).fetchall()
    lang_rows = con.execute(
        f"""SELECT lang, COUNT(*) FROM read_parquet('{SRC}/documents.parquet')
            GROUP BY lang ORDER BY lang"""
    ).fetchall()
    con.close()
    vocab = [r[0] for r in vocab_rows]
    vw = np.array([r[1] for r in vocab_rows], dtype=np.float64)
    langs = [r[0] for r in lang_rows]
    lw = np.array([r[1] for r in lang_rows], dtype=np.float64)
    return vocab, vw / vw.sum(), langs, lw / lw.sum()


def gen_documents(rng: np.random.Generator) -> None:
    vocab, vp, langs, lp = _empirical_docs_profile()
    lengths = rng.integers(10, 101, size=N_DOCS)
    tok_idx = rng.choice(len(vocab), size=int(lengths.sum()), p=vp)
    texts: list[str] = []
    pos = 0
    varr = np.array(vocab)
    for n in lengths:
        texts.append(" ".join(varr[tok_idx[pos : pos + n]]))
        pos += n
    # plant exact duplicates at the measured rate (re-ingested docs)
    n_dup = int(N_DOCS * DUP_RATE)
    dup_to = rng.choice(N_DOCS, size=n_dup, replace=False)
    dup_from = rng.choice(N_DOCS, size=n_dup)
    for t, f in zip(dup_to, dup_from):
        texts[t] = texts[f]
    table = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                np.array(langs)[rng.choice(len(langs), size=N_DOCS, p=lp)]
            ),
            "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, f"{OUT}/documents.parquet")


def gen_embeddings(rng: np.random.Generator) -> None:
    dim, n_labels = 64, 10
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, size=N_VECS)
    x = centers[labels] + 0.2 * rng.standard_normal((N_VECS, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")


def gen_events(rng: np.random.Generator) -> None:
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = start + rng.integers(0, span_us, size=N_EVENTS).astype("timedelta64[us]")
    ts.sort()  # arrival-ordered like a real event log
    types = np.array(["view", "click", "purchase", "signup", "error"])
    table = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, N_USERS, size=N_EVENTS), pa.int64()
            ),
            "event_type": pa.array(types[rng.integers(0, 5, size=N_EVENTS)]),
            "value": pa.array(rng.uniform(0, 100, size=N_EVENTS).round(2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVENTS)]
            ),
        }
    )
    pq.write_table(table, f"{OUT}/events.parquet")


def gen_lineitem(rng: np.random.Generator) -> None:
    """10x sf0.1's (supplier, part) co-occurrence shape for the graph
    tier — 6M rows, 10,000 suppliers x 200,000 parts, uniform pairing
    (matches the TPC-H generator's uniform l_suppkey/l_partkey draw) —
    with the FULL sf0.1 column set (r7: the round-6 slim 5-column table
    broke sf1 strict checks for any query touching discount/flag/date),
    TPC-H-shaped distributions and identical arrow types."""
    n = 6_000_000
    base = np.datetime64("1992-01-01")
    table = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(1, 1_500_001, size=n), pa.int64()),
            "l_partkey": pa.array(rng.integers(1, 200_001, size=n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(1, 10_001, size=n), pa.int64()),
            "l_linenumber": pa.array(
                rng.integers(1, 8, size=n).astype("int32"), pa.int32()
            ),
            "l_quantity": pa.array(rng.integers(1, 51, size=n).astype("float64")),
            "l_extendedprice": pa.array(rng.uniform(900, 105000, size=n).round(2)),
            "l_discount": pa.array(
                (rng.integers(0, 11, size=n) / 100.0)  # 0.00..0.10 step .01
            ),
            "l_tax": pa.array((rng.integers(0, 9, size=n) / 100.0)),
            "l_returnflag": pa.array(
                np.array(["R", "A", "N"])[rng.integers(0, 3, size=n)]
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, size=n)]
            ),
            "l_shipdate": pa.array(
                base + rng.integers(0, 2526, size=n).astype("timedelta64[D]"),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(table, f"{OUT}/lineitem.parquet")


def gen_orders(rng: np.random.Generator) -> None:
    """10x sf0.1 orders for the window tier: 1.5M rows, 150k customers,
    the same 1995-2001 date span and price range."""
    n = 1_500_000
    start = np.datetime64("1995-01-01T00:00:00", "us")
    span_us = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype("timedelta64[D]").astype(int)) * 86400 * 1_000_000
    statuses = np.array(["O", "F", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    table = pa.table(
        {
            "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "o_custkey": pa.array(rng.integers(1, 150_001, size=n), pa.int64()),
            "o_orderstatus": pa.array(statuses[rng.integers(0, 3, size=n)]),
            "o_totalprice": pa.array(rng.uniform(1000, 500000, size=n).round(2)),
            "o_orderdate": pa.array(
                start + rng.integers(0, span_us, size=n).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(prios[rng.integers(0, 5, size=n)]),
        }
    )
    pq.write_table(table, f"{OUT}/orders.parquet")


def gen_customer(rng: np.random.Generator) -> None:
    """10x sf0.1 customers: 150k rows, TPC-H name shape, 25 nations,
    5 segments."""
    n = 150_000
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    table = pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            # int32, matching the driver testdata's customer schema — the
            # r16 catalog schema contract pins c_nationkey INT, and a
            # declared-schema read of an int64 file fails the scan
            "c_nationkey": pa.array(rng.integers(0, 25, size=n), pa.int32()),
            "c_acctbal": pa.array(rng.uniform(-999, 9999, size=n).round(2)),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, size=n)]),
        }
    )
    pq.write_table(table, f"{OUT}/customer.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    # the 4 dimension tables are copied from sf0.1 verbatim (documented in
    # BENCH_SF1.md): cross-engine exactness needs identical inputs, not
    # referentially-scaled dims — and the oracle harness binds views for
    # ALL tables, so a missing dim fails every sf1 strict check
    import shutil

    for dim in ("region", "nation", "supplier", "part"):
        path = f"{OUT}/{dim}.parquet"
        if not os.path.exists(path):
            shutil.copy(f"{SRC}/{dim}.parquet", path)
            print(f"{dim}: copied from sf0.1")
    rng = np.random.default_rng(42)
    tables = [
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("events", gen_events),
        ("lineitem", gen_lineitem),
        ("orders", gen_orders),
        ("customer", gen_customer),
    ]
    # Schema-drift guard (r16): an output written by an OLDER generator
    # (e.g. the pre-r16 int64 c_nationkey) would be silently kept by the
    # exists-skip and then fail every declared-schema read far from the
    # cause. Each existing file is checked against the driver testdata's
    # schema for the same table (names + types); ANY drift regenerates
    # ALL generated tables — selective regeneration would desync the
    # shared rng stream and break the seed-42 determinism contract.
    def _drifted(name: str) -> bool:
        import pyarrow.parquet as pq

        path, ref = f"{OUT}/{name}.parquet", f"/root/testdata/sf0.1/{name}.parquet"
        if not (os.path.exists(path) and os.path.exists(ref)):
            return False
        cur = [(f.name, str(f.type)) for f in pq.read_schema(path)]
        want = [(f.name, str(f.type)) for f in pq.read_schema(ref)]
        if cur != want:
            print(f"{name}: existing schema drifted from testdata "
                  f"({cur} != {want})")
            return True
        return False

    regen_all = any(_drifted(name) for name, _ in tables)
    if regen_all:
        print("schema drift detected: regenerating all generated tables")
    for name, fn in tables:
        path = f"{OUT}/{name}.parquet"
        if os.path.exists(path) and not regen_all:
            print(f"{name}: exists, skipped")
            continue
        fn(rng)
        print(f"{name}: wrote {path}")


if __name__ == "__main__":
    main()
