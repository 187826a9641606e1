from __future__ import annotations

import pytest

from nadeefiler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nadeefiler_tests", parallelism=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_cfg():
    from nadeefiler_spark.datagen import GenConfig

    return GenConfig(n_rows=1200, seed=42, dur_min_ms=40, dur_max_ms=160)


@pytest.fixture(scope="session")
def clips_dir(spark, tiny_cfg, tmp_path_factory):
    from nadeefiler_spark import datagen

    out = str(tmp_path_factory.mktemp("clips_data"))
    datagen.write_clips(spark, out, tiny_cfg)
    return out
