import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def artifacts():
    from astrospark.crf import CrfModel
    from astrospark.lexicon import load_artifacts
    from astrospark.train import WEIGHTS_PATH

    vocab, trie = load_artifacts()
    model = CrfModel.load(WEIGHTS_PATH)
    return vocab, trie, model


@pytest.fixture(scope="session")
def spark():
    from astrospark.engine.session import build_session

    spark = build_session(app_name="astrospark-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
