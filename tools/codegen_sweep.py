"""Registry-wide whole-stage-codegen guard.

Runs every batch query at sf0.001 under a stderr-captured session and
fails if ANY query logs Spark's "Expr codegen error and falling back
to interpreter mode" warning — the silent perf cliff where a Janino
compile bug drops a projection to interpreted row-at-a-time
evaluation (found once in the quality-score expression; this sweep
keeps it from coming back anywhere).

Usage: python tools/codegen_sweep.py [sf_dir] [name ...]
Exit code 1 if a query errors or any codegen fallback is logged.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    # run in a child so ALL jvm stderr (the codegen warnings go to the
    # JVM's log4j console appender) is capturable
    code = f"""
import sys
sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
from hadoop_app_spark import get_spark
from hadoop_app_spark.queries import REGISTRY
spark = get_spark("codegen-sweep")
spark.sparkContext.setLogLevel("WARN")
only = {sorted(only)!r}
for name, qd in REGISTRY.items():
    if name.startswith("stream_") or (only and name not in only):
        continue
    try:
        qd.fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
        print("RAN", name, flush=True)
    except Exception as e:
        print("ERR", name, str(e).splitlines()[0][:160], flush=True)
spark.stop()
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    out = proc.stdout + proc.stderr
    ran = out.count("RAN ")
    errs = [line for line in out.splitlines() if line.startswith("ERR ")]
    fallbacks = out.count("codegen error and falling back")
    print(f"ran={ran} errors={len(errs)} codegen_fallbacks={fallbacks}")
    for e in errs:
        print(e)
    # a child that died before the loop (broken env, bad sf_dir) must
    # not read as a green guard: nonzero exit or zero queries = failure
    if proc.returncode != 0 or ran == 0:
        print(f"sweep child failed (rc={proc.returncode}, ran={ran})")
        print("\n".join(out.splitlines()[-15:]))
        return 1
    if errs or fallbacks:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
