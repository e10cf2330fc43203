"""TensorBoard shim (SURVEY.md §5.5): scalar events round-trip through
the hand-rolled TFRecord/Event encoding (CRCs verified on read)."""

import glob
import os


def test_scalar_roundtrip(tmp_path):
    from lisec_tpu.utils.tb_writer import (TensorBoardWriter,
                                           read_scalar_events)
    w = TensorBoardWriter(str(tmp_path))
    w.write_scalars(1, {"loss": 0.5, "acc": 0.25})
    w.write_scalars(2, {"loss": 0.25, "skipme": "not-a-float"})
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    merged = {}
    for e in events:
        merged.setdefault(e["step"], {}).update(e["scalars"])
    assert merged[1] == {"loss": 0.5, "acc": 0.25}
    assert merged[2] == {"loss": 0.25}


def test_metrics_logger_tb(tmp_path):
    from lisec_tpu.training.loop import MetricsLogger
    from lisec_tpu.utils.tb_writer import read_scalar_events
    lg = MetricsLogger(str(tmp_path / "metrics.jsonl"), tensorboard=True)
    lg.log({"step": 10, "loss": 1.5})
    lg.close()
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    assert any(e["step"] == 10 and e["scalars"].get("loss") == 1.5
               for e in events)
