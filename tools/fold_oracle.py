#!/usr/bin/env python3
"""Independent CROSS-VALIDATION oracle for the cost-basis fold family
(q05 avg cost, q06 realized PnL, q07 overview, q15 totals). Since
round 16 the primary oracle (CostBasis.foldSql) is a lambda-free
recursive CTE that runs direct in DuckDB at every probe scale, so this
replica is no longer on the verification path — it remains as a second
implementation in a different language/engine to cross-check the SQL
against (it validated the recursive form bit-exact over all 5,909,730
sf1 keys). History: the original list_reduce oracle segfaulted at sf1
volume (rc=-11) AND silently corrupted one key's state at sf0.1;
a struct-accumulator variant miscomputed a 5-event key in isolation —
DuckDB 1.0 composite-accumulator lambdas are unreliable, hence the
plain-relational rewrite. The per-(user, ticker) fold runs here in a
plain Python loop — same event order, same state machine — and each
query's remaining relational shell stays in DuckDB over the injected
`folded` table. Canonicalization matches tools/compare.py exactly.

Usage: python3 tools/fold_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, os, glob
import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


TRADES = """
  SELECT l_orderkey*10 + l_linenumber AS id,
         l_suppkey AS user_id,
         l_partkey AS ticker,
         CAST(l_shipdate AS DATE) AS ts,
         CASE WHEN l_returnflag='R' THEN 'SELL' ELSE 'BUY' END AS side,
         l_quantity AS qty,
         l_extendedprice/l_quantity AS price,
         l_discount AS fee
  FROM lineitem"""


def fold(trades: pd.DataFrame) -> pd.DataFrame:
    u = trades["user_id"].to_numpy()
    t = trades["ticker"].to_numpy()
    qty = trades["qty"].to_numpy(dtype=float)
    price = trades["price"].to_numpy(dtype=float)
    fee = trades["fee"].to_numpy(dtype=float)
    isbuy = (trades["side"] == "BUY").to_numpy()
    rows, cur = [], None
    q = c = r = 0.0
    for i in range(len(u)):
        k = (u[i], t[i])
        if k != cur:
            if cur is not None:
                rows.append((cur[0], cur[1], q, c, r))
            cur, q, c, r = k, 0.0, 0.0, 0.0
        if isbuy[i]:
            nq = q + qty[i]
            c = (q * c + (qty[i] * price[i] + fee[i])) / nq if nq > 0 else 0.0
            q = nq
        elif q > 0:  # sells against a non-positive holding are no-ops
            sold = min(qty[i], q)
            q -= sold
            r += (price[i] - c) * sold
    if cur is not None:
        rows.append((cur[0], cur[1], q, c, r))
    return pd.DataFrame(rows, columns=["user_id", "ticker", "qty", "avg_cost", "realized"])


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("part", "lineitem"):
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    trades = con.execute(
        f"SELECT * FROM ({TRADES}) "
        "ORDER BY user_id, ticker, ts, id, side, qty, price, fee").fetchdf()
    folded = fold(trades)
    con.register("folded", folded)

    oracles = {
        "q05_avg_cost":
            "SELECT user_id, ticker, avg_cost AS avg_buy_price "
            "FROM folded WHERE qty > 0 ORDER BY user_id, ticker",
        "q06_realized_pnl":
            "SELECT user_id, ticker, realized FROM folded ORDER BY user_id, ticker",
        "q15_unrealized_totals": f"""
            WITH trades AS ({TRADES}),
            pos AS (
              SELECT user_id, ticker,
                     SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) AS qty
              FROM trades GROUP BY user_id, ticker
              HAVING SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) <> 0),
            costs AS (SELECT user_id, ticker, avg_cost AS avg_buy_price
                      FROM folded WHERE qty > 0),
            last AS (SELECT p_partkey AS ticker, p_retailprice AS last_close FROM part),
            ov AS (
              SELECT pos.user_id, pos.qty, costs.avg_buy_price, last.last_close
              FROM pos
              LEFT JOIN costs ON pos.user_id = costs.user_id AND pos.ticker = costs.ticker
              LEFT JOIN last ON pos.ticker = last.ticker
              WHERE pos.qty > 0),
            t AS (
              SELECT user_id,
                     SUM(CAST(ROUND(qty*avg_buy_price*1000000.0) AS BIGINT)) AS inv,
                     SUM(CAST(ROUND(qty*last_close*1000000.0) AS BIGINT)) AS mv
              FROM ov GROUP BY user_id)
            SELECT user_id,
                   CAST(inv AS DOUBLE)/1000000.0 AS total_invested,
                   CAST(mv AS DOUBLE)/1000000.0 AS total_mv,
                   CAST(mv - inv AS DOUBLE)/1000000.0 AS total_pnl,
                   CASE WHEN inv > 0
                        THEN CAST(mv - inv AS DOUBLE)/CAST(inv AS DOUBLE)*100.0 END AS total_pct
            FROM t ORDER BY user_id""",
        "q07_overview": f"""
            WITH trades AS ({TRADES}),
            pos AS (
              SELECT user_id, ticker,
                     SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) AS qty
              FROM trades GROUP BY user_id, ticker
              HAVING SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) <> 0),
            costs AS (SELECT user_id, ticker, avg_cost AS avg_buy_price
                      FROM folded WHERE qty > 0),
            last AS (SELECT p_partkey AS ticker, p_retailprice AS last_close FROM part)
            SELECT pos.user_id, pos.ticker, pos.qty, costs.avg_buy_price, last.last_close,
                   pos.qty * last.last_close AS market_value,
                   (last.last_close - costs.avg_buy_price) * pos.qty AS unreal_pnl
            FROM pos
            LEFT JOIN costs ON pos.user_id = costs.user_id AND pos.ticker = costs.ticker
            LEFT JOIN last ON pos.ticker = last.ticker
            ORDER BY pos.user_id, pos.ticker""",
    }

    n_ok = 0
    for name, sql in oracles.items():
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            # a missing/empty dump dir must name the query, not die in
            # pd.concat with "No objects to concatenate"
            print(f"{'MISSING':10} {name}: no parquet under "
                  f"{os.path.join(out_dir, name)} — did Verify run this query?")
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).fetchdf()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{'SCHEMA':10} {name}: spark={list(g.columns)} oracle={list(e.columns)}")
        elif len(g) != len(e):
            print(f"{'ROWCOUNT':10} {name}: spark={len(g)} oracle={len(e)}")
        elif g.equals(e):
            print(f"{'OK':10} {name}: rows={len(g)}")
            n_ok += 1
        else:
            neq = (g != e) & ~(g.isna() & e.isna())
            print(f"{'VALUES':10} {name}: {int(neq.any(axis=1).sum())} rows differ")
    print(f"{n_ok}/{len(oracles)} fold queries match")
    sys.exit(0 if n_ok == len(oracles) else 1)


if __name__ == "__main__":
    main()
