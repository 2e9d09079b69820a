"""Package cello_spark and launch tools/submit_kg.py via the REAL
`spark-submit --py-files` — the north rule's literal deployment: the
package reaches driver + executors only through the zip, and
`local-cluster[W,C,M]` gives W separate executor JVMs.

Usage: python tools/run_spark_submit.py [workers] [cores_per] [n_docs]

Writes BENCH/submit_smoke.json with the parsed SUBMIT_KG line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores_per = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000

    sys.path.insert(0, REPO)
    from cello_spark.session import build_pyfiles_zip

    zpath = build_pyfiles_zip("/tmp/cello_spark_submit.zip")

    spark_submit = which("spark-submit") or "/opt/spark/bin/spark-submit"
    total = workers * cores_per
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{workers},{cores_per},2048]",
        "--py-files", zpath,
        "--conf", f"spark.sql.shuffle.partitions={2 * total}",
        "--conf", f"spark.default.parallelism={total}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.executor.memory=2g",
        # fixed pre-touched executor heaps (see session.py rationale)
        "--conf", "spark.executor.extraJavaOptions="
                  "-XX:+UseG1GC -XX:+AlwaysPreTouch -Xms2g",
        "--conf", "spark.python.worker.reuse=true",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "tools", "submit_kg.py"),
        str(n_docs),
    ]
    # the driver must NOT inherit the repo on its import path — that is
    # the point of the smoke. Run from a neutral cwd with a clean
    # PYTHONPATH; cello_spark then resolves only via --py-files.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp", env=env)
    line = next(
        (ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_KG ")),
        None,
    )
    if line is None:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        print("spark-submit smoke FAILED (no SUBMIT_KG line)")
        return 1
    parsed = json.loads(line[len("SUBMIT_KG "):])
    parsed["workers"] = workers
    parsed["cores_per_worker"] = cores_per
    parsed["launcher"] = "spark-submit --py-files"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "submit_smoke.json"), "w") as f:
        json.dump(parsed, f, indent=2)
    print(json.dumps(parsed))
    return 0 if parsed.get("gate") else 1


if __name__ == "__main__":
    raise SystemExit(main())
