import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The write-path suites run under BOTH carry modes (tools/verify_round.sh):
# hardlink (default; zero-copy proven by shared inodes) and reference
# (object-storage simulation; zero-copy proven by manifest refs into the
# parent version and ABSENCE of physical copies). Tests that assert
# inodes branch on this flag and assert the manifest contract instead.
REFERENCE_LINK_MODE = os.environ.get("PDS_LINK_MODE") == "reference"


def physical_parquet(d):
    """Physical parquet files under a version/partition dir ({} if the
    dir was never materialized — the reference-mode carry leaves
    untouched partitions entirely absent)."""
    out = {}
    for root, _dirs, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                out[os.path.relpath(p, d)] = os.stat(p).st_ino
    return out


def carried_refs_into(catalog, table, version, src_version):
    """Manifest refs of (table, version) that point into src_version's
    directory — the reference-mode zero-copy evidence."""
    refs = catalog.get_manifest(table, version) or []
    return [r for r in refs if r.startswith(f"{table}/{src_version}/")]


def assert_partition_zero_copy(catalog, table, v1_dir, v2_dir, part, rewritten):
    """Mode-aware zero-copy proof for one hive partition across an
    upsert/delete version step. hardlink mode: untouched partitions
    share inodes between the two version dirs; rewritten ones don't.
    reference mode: untouched partitions are carried as pure manifest
    refs (NO physical file under the new version dir); rewritten ones
    are the new version's own files."""
    v2 = os.path.basename(os.path.normpath(v2_dir))
    if REFERENCE_LINK_MODE:
        refs = [r for r in (catalog.get_manifest(table, v2) or []) if f"/{part}/" in r]
        own = [r for r in refs if r.startswith(f"{table}/{v2}/")]
        ext = [r for r in refs if not r.startswith(f"{table}/{v2}/")]
        assert refs, f"{part}: no manifest refs at all"
        if rewritten:
            assert own and not ext, f"{part}: expected rewrite, manifest carries {ext}"
        else:
            assert ext and not own, f"{part}: expected pure-metadata carry, got own files {own}"
            assert not physical_parquet(os.path.join(v2_dir, part)), f"{part} was physically copied"
    else:
        i1 = set(physical_parquet(os.path.join(v1_dir, part)).values())
        i2 = set(physical_parquet(os.path.join(v2_dir, part)).values())
        assert i1 and i2, f"{part}: missing files"
        if rewritten:
            assert i1 != i2, f"{part} should be rewritten"
        else:
            assert i1 == i2, f"{part} was rewritten, not linked"


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", shuffle_partitions=8)


@pytest.fixture()
def engine(spark, tmp_path):
    from patterns_devkit_spark import Engine

    return Engine(str(tmp_path / "wh"), spark=spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
