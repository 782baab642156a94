"""Daily market-indicator dashboard, end to end on one page.

The technical-analysis readout a revenue/trading desk reviews daily,
chained from the registered finance-window keys (COVERAGE.md §2.F
extensions) over the bundled fixtures' daily order series:

  momentum      the stochastic %K/%D cross (win_stochastic)
  trend         Aroon up/down freshness (win_aroon) and the Donchian
                channel position (win_donchian)
  volatility    ATR-14 width (win_atr)
  volume        on-balance volume direction (win_obv), the Money
                Flow Index (win_mfi) and the month-anchored VWAP
                benchmark (win_vwap)
  convergence   MACD line vs signal (win_macd)
  risk          trailing drawdown RMS (win_ulcer_index)

All the panel indicators share the same daily OHLC proxies over the
orders series, so the join on `day` is exact. Run:

    python examples/market_indicators.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("market-indicators")
    q = all_queries()

    sto = q["win_stochastic"](spark, sf_dir).select("day", "pct_k", "pct_d")
    aroon = q["win_aroon"](spark, sf_dir).select("day", "aroon_osc")
    don = q["win_donchian"](spark, sf_dir).select("day", "channel_position")
    atr = q["win_atr"](spark, sf_dir).select("day", "atr_14")
    obv = q["win_obv"](spark, sf_dir).select("day", "obv")
    macd = q["win_macd"](spark, sf_dir).select("day", "macd", "signal")
    mfi = q["win_mfi"](spark, sf_dir).select("day", "mfi")
    ulcer = q["win_ulcer_index"](spark, sf_dir).select("day", "ulcer_index")

    panel = (
        sto.join(aroon, "day", "left")
        .join(don, "day", "left")
        .join(atr, "day", "left")
        .join(obv, "day", "left")
        .join(macd, "day", "left")
        .join(mfi, "day", "left")
        .join(ulcer, "day", "left")
    )
    n = panel.count()
    print(f"== indicator panel: {n} trading days with full history")

    last = panel.orderBy(F.col("day").desc()).limit(5).collect()
    print("== latest 5 days (day, %K, %D, aroon_osc, chan_pos, atr, obv):")
    for r in reversed(last):
        def fmt(x, w=7):
            return f"{x:{w}.2f}" if x is not None else " " * (w - 4) + "none"
        print(
            f"   {r['day']}  k {fmt(r['pct_k'])}  "
            f"d {fmt(r['pct_d'])}  osc {fmt(r['aroon_osc'])}  "
            f"pos {fmt(r['channel_position'])}  atr {fmt(r['atr_14'])}  "
            f"obv {r['obv']}"
        )

    sig = panel.select(
        F.sum(F.when(F.col("pct_k") > 80, 1).otherwise(0)).alias("overbought"),
        F.sum(F.when(F.col("pct_k") < 20, 1).otherwise(0)).alias("oversold"),
        F.sum(F.when(F.col("aroon_osc") > 0, 1).otherwise(0)).alias("uptrend"),
        F.sum(
            F.when(F.col("macd") > F.col("signal"), 1).otherwise(0)
        ).alias("macd_bull"),
        F.sum(F.when(F.col("mfi") > 80, 1).otherwise(0)).alias("mfi_hot"),
    ).first()
    if sig is not None and n:
        print(
            f"== regime days: overbought(%K>80) {sig['overbought']}, "
            f"oversold(%K<20) {sig['oversold']}, "
            f"aroon uptrend {sig['uptrend']}, "
            f"macd bullish {sig['macd_bull']}, "
            f"mfi hot(>80) {sig['mfi_hot']}"
        )

    vwap = q["win_vwap"](spark, sf_dir)
    vtail = vwap.orderBy(F.col("day").desc()).limit(1).first()
    if vtail is not None:
        print(
            f"== month-to-date VWAP on {vtail['day']}: "
            f"{vtail['vwap']:.2f} over {vtail['cum_qty']} units"
        )

    print("== done")


if __name__ == "__main__":
    main()
