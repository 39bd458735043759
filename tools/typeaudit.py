#!/usr/bin/env python3
"""Arrow-type audit: for every oracle query, compare the Spark parquet
output schema against the DuckDB result schema as Arrow sees them.

Catches the class of driver-level hash mismatches that value-based
local comparison can miss: round 1's only failures were DuckDB
SUM(BIGINT) widening to HUGEINT -> decimal128 while Spark emitted
int64. Plain integer WIDTH differences (int32 vs int64) are proven
harmless by the round-1 driver artifact (many green rows had them);
anything decimal/float/string-shaped must match exactly.

Usage: python3 tools/typeaudit.py <sf_dir> <verify_out_dir>
"""
import duckdb, json, sys, glob
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
WIDTHS = {'int32', 'int64'}  # driver-tolerated width pair
risky = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); risky += 1; continue
    s_schema = pq.read_schema(files[0])
    try:
        d_schema = con.sql(sql).arrow().schema
    except Exception as e:
        print(f'{name}: ORACLE ERR {str(e)[:100]}'); risky += 1; continue
    s_map = {f.name: str(f.type) for f in s_schema}
    d_map = {f.name: str(f.type) for f in d_schema}
    if set(s_map) != set(d_map):
        print(f'{name}: COLUMN SET spark={sorted(s_map)} duck={sorted(d_map)}')
        risky += 1
        continue
    for c in sorted(s_map):
        st, dt = s_map[c], d_map[c]
        norm = lambda t: t.replace('large_string', 'string').replace('large_list', 'list')
        if norm(st) == norm(dt):
            continue
        if {st, dt} <= WIDTHS:
            continue  # harmless width difference
        print(f'RISKY {name}.{c}: spark={st} duck={dt}')
        risky += 1
print('risky type mismatches:', risky)
sys.exit(1 if risky else 0)
