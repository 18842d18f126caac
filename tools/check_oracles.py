#!/usr/bin/env python3
"""Dev-side oracle parity check: compare Verify.scala parquet dumps
against DuckDB running the dumped oracle SQL (same compare the driver
does: sort columns by name, sort rows, hash values)."""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    # Serialize any non-scalar object cell (list, tuple, ndarray, nested)
    # to a JSON string so sort_values/factorize never see an unhashable
    # value, and list-vs-ndarray representations compare equal.
    df = df.reindex(sorted(df.columns), axis=1)
    def _ser(v):
        # only SEQUENCE cells need serializing (unhashable in sort/factorize);
        # scalars like datetime.date/Decimal must stay as-is — astype(str)
        # renders them identically on both sides, json.dumps would not
        if not isinstance(v, (list, tuple)) and not hasattr(v, "ndim"):
            return v
        def _default(o):
            if hasattr(o, "item") and not hasattr(o, "__len__"):
                return o.item()  # numpy scalar → python scalar
            if hasattr(o, "__iter__"):
                return list(o)
            return str(o)
        try:
            return json.dumps(v, default=_default)
        except TypeError:
            return str(v)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(_ser)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pdir = os.path.join(out_dir, name)
    if not os.path.isdir(pdir) and not os.path.exists(pdir):
        print(f"{name}: MISSING spark dump"); fails.append(name); continue
    spark_df = pq.read_table(pdir).to_pandas()
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as ex:
        print(f"{name}: ORACLE SQL ERROR: {ex}"); fails.append(name); continue
    a, b = canon(spark_df), canon(duck_df)
    schema_ok = list(a.columns) == list(b.columns)
    rows_ok = len(a) == len(b)
    try:
        hash_ok = a.astype(str).equals(b.astype(str))
    except Exception:
        hash_ok = False
    status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name}: {status} rows {len(a)}/{len(b)} schema_ok={schema_ok} "
              f"cols spark={list(a.columns)} duck={list(b.columns)}")
        if rows_ok and schema_ok:
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            print(a[neq].head(3)); print(b[neq].head(3))
    else:
        print(f"{name}: OK ({len(a)} rows)")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
