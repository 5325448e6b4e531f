"""End-to-end CLI tests: tiny synthetic dataset through the real entry
points (the verify-skill drive, codified)."""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("smoke")
    (d / "videos").mkdir()
    words = ["excellent", "good", "fair", "poor", "bad"]
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        frames = [
            Image.new("RGB", (64, 48), (int(rng.integers(0, 255)), 30 + i * 5, 60))
            for _ in range(10)
        ]
        p = d / "videos" / f"clip{i}.gif"
        frames[0].save(p, save_all=True, append_images=frames[1:], duration=100)
        w = words[i % 5]
        mos = {"excellent": 90, "good": 70, "fair": 50, "poor": 30, "bad": 10}[w]
        rows.append(
            {
                "video": f"videos/clip{i}.gif",
                "id": f"clip{i}.gif->{mos}",
                "mos": mos,
                "conversations": [
                    {"from": "human", "value": "How would you rate the static quality of this video? "},
                    {"from": "gpt", "value": f"The static quality of the video is {w}."},
                ],
            }
        )
    ann = d / "ann.jsonl"
    ann.write_text("".join(json.dumps(r) + "\n" for r in rows))
    meta = d / "meta.json"
    meta.write_text(
        json.dumps(
            {
                "smoke": {
                    "root": str(d),
                    "annotation_train": str(ann),
                    "annotation_test": str(ann),
                    "annotation": str(ann),
                    "repeat_time": 1,
                    "data_augment": False,
                    "length": 8,
                }
            }
        )
    )
    return d


COMMON = [
    "--model_scale", "tiny", "--max_seq_length", "256", "--bf16", "False",
    "--num_segments", "4", "--dataloader_num_workers", "1",
    "--group_by_length", "False", "--drop_path_rate", "0.0",
    # the test env exposes 8 virtual devices; a 1-device mesh keeps the
    # global batch smaller than the 8-sample dataset
    "--mesh_data", "1", "--mesh_fsdp", "1",
]


@pytest.mark.slow
def test_stage1_train_and_eval_e2e(fixture_dir, tmp_path):
    from aigv_assessor_tpu.cli import stage1_eval, stage1_train

    out = tmp_path / "out"
    trainer = stage1_train.main(
        [
            "--meta_path", str(fixture_dir / "meta.json"),
            "--output_dir", str(out),
            "--do_train", "True", "--num_train_epochs", "1",
            "--per_device_train_batch_size", "2", "--save_steps", "100",
            *COMMON,
        ]
    )
    log = (out / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) >= 1
    rec = json.loads(log[0])
    assert np.isfinite(rec["loss"])

    out2 = tmp_path / "eval"
    metrics = stage1_eval.main(
        [
            "--meta_path", str(fixture_dir / "meta.json"),
            "--output_dir", str(out2),
            "--eval_batch_size", "4",
            "--output_file", "r.csv", "--metrics_file", "m.txt",
            *COMMON,
        ]
    )
    assert set(metrics) >= {"accuracy", "SRCC", "PLCC", "KRCC"}
    with open(out2 / "r.csv") as f:
        header = next(csv.reader(f))
    assert header == ["video_name", "answer", "output", "mos", "level"]


@pytest.mark.slow
def test_score_cli_e2e(fixture_dir, tmp_path):
    from aigv_assessor_tpu.cli import score

    out = tmp_path / "scores.csv"
    rows = score.main(
        [
            "--model_scale", "tiny", "--videos", str(fixture_dir / "videos"),
            "--batch_size", "4", "--num_segments", "4", "--bf16", "False",
            "--max_seq_length", "512", "--out", str(out), "--workers", "1",
        ]
    )
    assert len(rows) == 8
    assert all(np.isfinite(r[1]) for r in rows)
    with open(out) as f:
        header = next(csv.reader(f))
    assert header == ["video_name", "pred_score"]


@pytest.mark.slow
def test_score_cli_int4_e2e(fixture_dir, tmp_path):
    """Quantized serving through the CLI: --int4 quantizes the LLM to
    nibble-packed kernels at load and scores every video to a finite
    number (the load_in_4bit serving counterpart)."""
    from aigv_assessor_tpu.cli import score

    out = tmp_path / "scores_i4.csv"
    rows = score.main(
        [
            "--model_scale", "tiny", "--videos", str(fixture_dir / "videos"),
            "--batch_size", "4", "--num_segments", "4", "--bf16", "False",
            "--max_seq_length", "512", "--out", str(out), "--workers", "1",
            "--int4", "True",
        ]
    )
    assert len(rows) == 8
    assert all(np.isfinite(r[1]) for r in rows)


@pytest.mark.slow
def test_stage2_lora_train_and_eval_e2e(fixture_dir, tmp_path):
    """Stage-2 (LoRA) drive: L1 score training with adapters in both
    towers, best-metric LoRA artifact dump, pred_score CSV column and the
    *_score metric block (BASELINE #5's single-chip analog)."""
    from aigv_assessor_tpu.cli import stage2_eval, stage2_train

    out = tmp_path / "out2"
    stage2_train.main(
        [
            "--meta_path", str(fixture_dir / "meta.json"),
            "--output_dir", str(out),
            "--do_train", "True", "--num_train_epochs", "1",
            "--per_device_train_batch_size", "2", "--save_steps", "100",
            "--use_backbone_lora", "2", "--use_llm_lora", "2",
            *COMMON,
        ]
    )
    log = (out / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) >= 1
    assert np.isfinite(json.loads(log[0])["loss"])

    out2 = tmp_path / "eval2"
    metrics = stage2_eval.main(
        [
            "--meta_path", str(fixture_dir / "meta.json"),
            "--output_dir", str(out2),
            "--eval_batch_size", "4",
            "--output_file", "r.csv", "--metrics_file", "m.txt",
            "--use_backbone_lora", "2", "--use_llm_lora", "2",
            *COMMON,
        ]
    )
    assert {"SRCC_score", "PLCC_score", "KRCC_score"} <= set(metrics)
    with open(out2 / "r.csv") as f:
        header = next(csv.reader(f))
    assert "pred_score" in header
