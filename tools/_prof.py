"""Interactive profiling helpers for the optimization round (import
from a REPL: ``from tools._prof import *``)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_spark.queries import all_queries  # noqa: E402
from aws_datalake_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof")
Q = all_queries()


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def tq(name: str, n: int = 3) -> list[float]:
    f = Q[name]
    noop(f(spark, SF))
    ts = []
    for _ in range(n):
        t0 = time.time()
        noop(f(spark, SF))
        ts.append(round(time.time() - t0, 3))
    print(name, ts)
    return ts


def tdf(df, n: int = 3, warm: bool = True) -> list[float]:
    if warm:
        noop(df)
    ts = []
    for _ in range(n):
        t0 = time.time()
        noop(df)
        ts.append(round(time.time() - t0, 3))
    print(ts)
    return ts


def plan(name: str, suffix: str = "before") -> None:
    """Dump explain('formatted') to plans/r10/<name>_<suffix>.txt."""
    df = Q[name](spark, SF)
    txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r10", f"{name}_{suffix}.txt",
    )
    with open(out, "w") as f:
        f.write(txt)
    print(out, len(txt.splitlines()), "lines")
