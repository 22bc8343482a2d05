"""Package crawler_spark for spark-submit --py-files deployment.

Builds ``dist/crawler_spark.zip`` containing the package (sources only,
no tests/tools) so a cluster job launches as:

    spark-submit --master <cluster> \
        --py-files dist/crawler_spark.zip \
        tools/submit_smoke.py <workdir>

Executors unpack the zip onto their Python path — the production analog
of the ``spark.executorEnv.PYTHONPATH`` the local-cluster scaling bench
sets. ``tools/submit_smoke.py`` is a minimal driver program that runs a
short crawl through the packaged engine; the packaging E2E is exercised
by running it under spark-submit with a multi-executor local-cluster
master (see README § deployment).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "crawler_spark.zip")
    pkg = os.path.join(REPO, "crawler_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build()
    print(path)
    print(
        "launch: spark-submit --master <master> "
        f"--py-files {os.path.relpath(path, REPO)} tools/submit_smoke.py <workdir>"
    )
