import pytest

from featuregenerator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fg-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from featuregenerator_spark.sources.transcripts import synth_transcripts

    df = synth_transcripts(spark, n_convs=40, max_turns=30, seed=42)
    df.cache().count()
    return df
