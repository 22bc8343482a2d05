"""Deployment packaging: dist zip is self-contained and import-complete
(the spark-submit --py-files E2E itself is run out-of-band — README §
deployment — because it boots a separate multi-JVM cluster)."""

import os
import subprocess
import sys
import zipfile

from crawler_spark import __file__ as pkg_init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(pkg_init)))


def test_package_zip_contains_every_module(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import package as pkgmod
    finally:
        sys.path.pop(0)
    out = pkgmod.build(str(tmp_path))
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
    # every source module of the installed package is in the zip
    pkg_root = os.path.join(REPO, "crawler_spark")
    for root, _dirs, files in os.walk(pkg_root):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, fn), REPO)
                assert rel in names, f"missing from zip: {rel}"
    # zip is importable standalone: run a fresh interpreter with ONLY the
    # zip on sys.path and import the engine modules
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import crawler_spark.plans.crawl, crawler_spark.operators.selection, "
        "crawler_spark.functions.urlnorm, crawler_spark.operators.clients; "
        "print('ok')" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": ""}, cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
