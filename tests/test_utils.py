"""Utility-module tests: StepTimer, MetricsWriter, mesh construction, data
loader threading."""

import json
import time

import numpy as np
import pytest

from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.utils.metrics_writer import MetricsWriter
from aigv_assessor_tpu.utils.profiling import StepTimer


class TestStepTimer:
    def test_summary_percentiles(self):
        t = StepTimer()
        for dur in (0.01, 0.02, 0.03):
            t.start()
            time.sleep(dur)
            t.stop()
        s = t.summary()
        assert s["steps"] == 3
        assert 0.01 <= s["mean_s"] <= 0.1
        assert s["max_s"] >= s["p50_s"]

    def test_context_manager_and_save(self, tmp_path):
        t = StepTimer()
        with t.step():
            pass
        p = tmp_path / "t.json"
        t.save(str(p))
        data = json.loads(p.read_text())
        assert data["steps"] == 1


class TestMetricsWriter:
    def test_jsonl_always_written(self, tmp_path):
        w = MetricsWriter(str(tmp_path), enable_tensorboard=False)
        w.write(1, {"loss": 0.5})
        w.write(2, {"loss": 0.25, "lr": 1e-4})
        w.close()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[1])
        assert rec["step"] == 2 and rec["lr"] == 1e-4


class TestMesh:
    def test_axes_and_shape(self):
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=100, fsdp=1, tensor=1))

    def test_auto_fsdp(self):
        cfg = MeshConfig.auto(n_devices=4, fsdp=True)
        assert cfg.fsdp == 4 and cfg.data == 1


class TestLoaderThreading:
    class _DS:
        def __init__(self, n, fail_at=None):
            self.n = n
            self.fail_at = fail_at

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            if self.fail_at is not None and i == self.fail_at:
                raise ValueError("boom")
            from aigv_assessor_tpu.data.dataset import Sample

            return Sample(
                video_name=str(i), answer="a", mos=float(i),
                input_ids=np.full(4, i, np.int32),
                labels=np.full(4, i, np.int32),
                attention_mask=np.ones(4, bool),
                pixel_values=np.zeros((1, 4, 4, 3), np.float32),
                image_flags=np.ones(1, np.int32),
            )

    def test_threaded_order_deterministic(self):
        from aigv_assessor_tpu.data.loader import DataLoader
        from aigv_assessor_tpu.data.sampler import ShardedBatchSampler

        ds = self._DS(12)
        bs = ShardedBatchSampler(12, global_batch_size=4, shuffle=False)
        loader = DataLoader(ds, bs, num_workers=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0].video_names == ["0", "1", "2", "3"]
        assert batches[2].mos.tolist() == [8.0, 9.0, 10.0, 11.0]

    def test_worker_exception_propagates(self):
        from aigv_assessor_tpu.data.loader import DataLoader
        from aigv_assessor_tpu.data.sampler import ShardedBatchSampler

        ds = self._DS(8, fail_at=5)
        bs = ShardedBatchSampler(8, global_batch_size=4, shuffle=False)
        loader = DataLoader(ds, bs, num_workers=2)
        with pytest.raises(ValueError, match="boom"):
            list(loader)


class TestConversationCopy:
    def test_template_isolation(self):
        from aigv_assessor_tpu.data.conversation import get_conv_template

        a = get_conv_template("internlm2-chat")
        a.append_message(a.roles[0], "hi")
        b = get_conv_template("internlm2-chat")
        assert b.messages == []
        assert a.messages != []
