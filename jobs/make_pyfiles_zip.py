"""Build dist/spark_fulltext.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import shutil


def main() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    out = shutil.make_archive(
        os.path.join(dist, "spark_fulltext"), "zip", repo,
        "open_source_search_engine_spark",
    )
    # make_archive with base_dir zips the package dir relative to repo
    print(out)
    return out


if __name__ == "__main__":
    main()
