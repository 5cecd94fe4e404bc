#!/usr/bin/env python
"""Package the engine as a --py-files zip: dist/lucene_solr_spark.zip."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "lucene_solr_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "lucene_solr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(make_zip())
