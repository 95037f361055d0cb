import json

from rvpt_tpu.utils.metrics import Metrics, setup_logging


def test_metrics_rolling_and_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = Metrics(window=3, jsonl_path=p)
    for i in range(5):
        m.log(loss=float(i), rays=100.0)
    assert m.last("loss") == 4.0
    assert m.mean("loss") == 3.0  # rolling window of 3: (2+3+4)/3
    assert m.summary()["rays"] == 100.0
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 5
    assert lines[-1]["loss"] == 4.0
    assert lines[-1]["step"] == 5


def test_setup_logging_idempotent():
    setup_logging("DEBUG")
    setup_logging("INFO")  # no duplicate handlers
    import logging

    assert len(logging.getLogger("rvpt_tpu").handlers) == 1
