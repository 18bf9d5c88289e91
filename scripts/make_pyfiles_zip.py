#!/usr/bin/env python
"""Package robokop_build_spark for `spark-submit --py-files` (north_rule
launch contract): python scripts/make_pyfiles_zip.py → robokop_build_spark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "robokop_build_spark.zip")
    pkg = os.path.join(REPO, "robokop_build_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
