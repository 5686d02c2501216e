#!/usr/bin/env python3
"""Scale-factor fixture generator — same schema, domains, and structure
as the driver-generated /root/testdata tables (reverse-measured from
sf0.1: row ratios, value ranges, the planted near-duplicate structure
in `documents`, unit-norm float32[64] embeddings), so the engine can be
scale-validated beyond the driver's largest fixture without touching
the read-only /root/testdata.

Usage: python3 tools/gensf.py <outdir> [sf]      (sf defaults to 1.0)

Deterministic (seed 42). At sf=1 the tables are 10x sf0.1:
lineitem 6M, orders 1.5M, events 1M, documents 50k, embeddings 20k.
Written as one parquet file per table (snappy), timestamps in us —
byte-compatible with the driver fixtures' read path.
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DAY_US = 86_400_000_000

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line',
         'merge', 'order', 'part', 'query', 'row', 'scan', 'slow',
         'small', 'sort', 'spark', 'stream', 'table', 'the', 'value',
         'vector', 'window']
ADJ = ['blue', 'cold', 'hot', 'large', 'new', 'old', 'red', 'small']
NOUN = ['anvil', 'bolt', 'gear', 'gizmo', 'plate', 'ring', 'rod', 'widget']
PTYPE = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
SEGMENT = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PRIORITY = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
REGION = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
EPOCH_1995 = np.datetime64('1995-01-01', 'us').astype('int64')
EPOCH_2024 = np.datetime64('2024-01-01', 'us').astype('int64')


ONLY = None  # --tables=a,b: generate only these (per-table seeds make
             # each table independent of which others are generated)


def want(name):
    return ONLY is None or name in ONLY


def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f'{name}.parquet'))
    print(f'{name:10s} {table.num_rows:>9,} rows')


def ts_us(int64_us):
    return pa.array(int64_us, type=pa.timestamp('us'))


def gen(outdir, sf=1.0, clusters=0, sigma=0.08):
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_event = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)
    n_user = max(1, n_cust // 10)

    if want('region'):
        write(outdir, 'region', pa.table({
            'r_regionkey': pa.array(np.arange(5, dtype=np.int32)),
            'r_name': REGION}))
    if want('nation'):
        write(outdir, 'nation', pa.table({
            'n_nationkey': pa.array(np.arange(25, dtype=np.int32)),
            'n_name': [f'NATION_{i}' for i in range(25)],
            'n_regionkey': pa.array(np.arange(25, dtype=np.int32) % 5)}))

    if want('customer'):
        r = np.random.RandomState(SEED)
        write(outdir, 'customer', pa.table({
            'c_custkey': np.arange(n_cust, dtype=np.int64),
            'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
            'c_nationkey': r.randint(0, 25, n_cust).astype(np.int32),
            'c_acctbal': np.round(r.uniform(-1000, 10000, n_cust), 2),
            'c_mktsegment': np.array(SEGMENT)[r.randint(0, 5, n_cust)]}))

    if want('supplier'):
        r = np.random.RandomState(SEED + 1)
        write(outdir, 'supplier', pa.table({
            's_suppkey': np.arange(n_supp, dtype=np.int64),
            's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
            's_nationkey': r.randint(0, 25, n_supp).astype(np.int32),
            's_acctbal': np.round(r.uniform(-1000, 10000, n_supp), 2)}))

    if want('part'):
        r = np.random.RandomState(SEED + 2)
        write(outdir, 'part', pa.table({
            'p_partkey': np.arange(n_part, dtype=np.int64),
            'p_name': [f'{ADJ[a]} {NOUN[b]}' for a, b in
                       zip(r.randint(0, 8, n_part), r.randint(0, 8, n_part))],
            'p_brand': [f'Brand#{i}' for i in r.randint(1, 26, n_part)],
            'p_type': np.array(PTYPE)[r.randint(0, 6, n_part)],
            'p_size': r.randint(1, 51, n_part).astype(np.int32),
            'p_retailprice': np.round(900.0 + 0.1 * np.arange(n_part), 2)}))

    if want('orders'):
        r = np.random.RandomState(SEED + 3)
        write(outdir, 'orders', pa.table({
            'o_orderkey': np.arange(n_ord, dtype=np.int64),
            'o_custkey': r.randint(0, n_cust, n_ord).astype(np.int64),
            'o_orderstatus': np.array(['F', 'O', 'P'])[r.randint(0, 3, n_ord)],
            'o_totalprice': np.round(r.uniform(1000, 500000, n_ord), 2),
            'o_orderdate': ts_us(EPOCH_1995 +
                                 r.randint(0, 2405, n_ord) * DAY_US),
            'o_orderpriority': np.array(PRIORITY)[r.randint(0, 5, n_ord)]}))

    if want('lineitem'):
        r = np.random.RandomState(SEED + 4)
        write(outdir, 'lineitem', pa.table({
            'l_orderkey': r.randint(0, n_ord, n_line).astype(np.int64),
            'l_partkey': r.randint(0, n_part, n_line).astype(np.int64),
            'l_suppkey': r.randint(0, n_supp, n_line).astype(np.int64),
            'l_linenumber': r.randint(1, 8, n_line).astype(np.int32),
            'l_quantity': r.randint(1, 51, n_line).astype(np.float64),
            'l_extendedprice': np.round(r.uniform(900, 105000, n_line), 2),
            'l_discount': np.round(r.randint(0, 11, n_line) * 0.01, 2),
            'l_tax': np.round(r.randint(0, 9, n_line) * 0.01, 2),
            'l_returnflag': np.array(['A', 'N', 'R'])[r.randint(0, 3, n_line)],
            'l_linestatus': np.array(['F', 'O'])[r.randint(0, 2, n_line)],
            'l_shipdate': ts_us(EPOCH_1995 +
                                r.randint(1, 2500, n_line) * DAY_US)}))

    if want('events'):
        r = np.random.RandomState(SEED + 5)
        # 30 days of events: uniform arrival times, sorted, sequential ids
        # (gives the measured exponential inter-arrival gaps for free)
        arrivals = np.sort(r.randint(0, 30 * DAY_US, n_event))
        write(outdir, 'events', pa.table({
            'event_id': np.arange(n_event, dtype=np.int64),
            'ts': ts_us(EPOCH_2024 + arrivals),
            'user_id': r.randint(0, n_user, n_event).astype(np.int64),
            'event_type': np.array(['click', 'error', 'purchase', 'signup',
                                    'view'])[r.randint(0, 5, n_event)],
            'value': np.round(r.exponential(50.0, n_event), 2),
            'props': [json.dumps({'k': int(k)})
                      for k in r.randint(0, 100, n_event)]}))

    if want('documents'):
        r = np.random.RandomState(SEED + 6)
        # documents: 10..100 words from the 30-word vocab; ~5% of docs are a
        # near-copy of a random earlier doc with one token replaced by the
        # out-of-vocab marker 'dup' (copies of copies yield 2-3 markers and
        # the occasional exact pair, as measured on sf0.1)
        texts = []
        langs = np.array(['en', 'de', 'es', 'fr', 'zh'])[
            np.where(r.uniform(size=n_doc) < 0.4, 0, r.randint(1, 5, n_doc))]
        for i in range(n_doc):
            if i > 16 and r.uniform() < 0.05:
                src = texts[r.randint(0, i)].split(' ')
                src[r.randint(0, len(src))] = 'dup'
                texts.append(' '.join(src))
            else:
                nw = r.randint(10, 101)
                texts.append(' '.join(
                    VOCAB[j] for j in r.randint(0, len(VOCAB), nw)))
        write(outdir, 'documents', pa.table({
            'doc_id': np.arange(n_doc, dtype=np.int64),
            'text': texts,
            'lang': langs,
            'source': [f'src{i % 20}' for i in range(n_doc)],
            'n_chars': pa.array([len(t) for t in texts], type=pa.int64())}))

    if want('embeddings'):
        r = np.random.RandomState(SEED + 7)
        if clusters:
            # CLUSTERABLE variant (--clusters K): planted Gaussian clusters on
            # the unit sphere — center + sigma*noise, renormalized. Real
            # embedding corpora are clusterable (that's why IVF works); the
            # default near-random variant is the pathological floor for ANN
            # recall, this is the realistic case the sqrt(N)-cells guidance
            # presumes. Per-dim sigma=0.08 -> 64-dim noise norm ~0.64 against
            # unit centers: same-cluster cosine ~0.7, distinct-center cosine
            # ~0 -- separable but overlapping, like real embedding corpora.
            centers = r.normal(size=(clusters, 64))
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            asn = r.randint(0, clusters, n_vec)
            v = (centers[asn] + sigma * r.normal(size=(n_vec, 64))).astype(np.float32)
        else:
            # unit-norm float32[64] embeddings, uniform labels
            v = r.normal(size=(n_vec, 64)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        write(outdir, 'embeddings', pa.table({
            'vec_id': np.arange(n_vec, dtype=np.int64),
            'embedding': pa.array(list(v), type=pa.list_(pa.float32())),
            'label': r.randint(0, 10, n_vec).astype(np.int32)}))


if __name__ == '__main__':
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    clusters, sigma = 0, 0.08
    for a in sys.argv[3:]:
        if a.startswith('--clusters='):
            clusters = int(a.split('=')[1])
        elif a.startswith('--sigma='):
            sigma = float(a.split('=')[1])
        elif a.startswith('--tables='):
            ONLY = set(a.split('=')[1].split(','))
    gen(out, sf, clusters, sigma)
