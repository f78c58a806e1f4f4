"""The dependency-free tfevents writer must be byte-compatible with
TensorBoard's own reader (tensorboard is installed in CI/dev envs;
the writer itself has zero deps)."""

import glob

import pytest

from wekws_tpu.train.tensorboard import SummaryWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("cv_loss", 0.25, step=0)
        w.add_scalars({"cv_loss": 0.125, "lr": 1e-3}, step=1)
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb.EventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            # the loader's data_compat pass upgrades simple_value
            # to a rank-0 tensor
            if v.WhichOneof("value") == "tensor":
                scalars[(v.tag, ev.step)] = v.tensor.float_val[0]
            else:
                scalars[(v.tag, ev.step)] = v.simple_value
    assert scalars[("cv_loss", 0)] == pytest.approx(0.25)
    assert scalars[("cv_loss", 1)] == pytest.approx(0.125)
    assert scalars[("lr", 1)] == pytest.approx(1e-3)
    assert events[1].wall_time > 1e9
