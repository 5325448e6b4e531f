"""Fused multi-perspective stage-2 eval: one decode+encode per video for P
perspective annotations (the reference evaluates each perspective as a
SEPARATE full run, `shell/train/stage2_train.sh:13` number=1..4).

Contract: the fused path's pred_score per perspective must match the
ordinary single-perspective eval CLI run on that perspective's meta alone.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def two_perspective_meta(tmp_path_factory):
    root = tmp_path_factory.mktemp("fused")
    vids = root / "videos"
    vids.mkdir()
    rng = np.random.default_rng(0)
    metas = []
    rows_per_p = [[], []]
    questions = [
        "How would you rate the static quality of this video?",
        "How would you rate the temporal quality of this video?",
    ]
    for i in range(5):
        frames = [
            Image.fromarray(
                rng.integers(0, 255, (48, 64, 3), np.uint8)
            )
            for _ in range(6)
        ]
        p = vids / f"clip{i}.gif"
        frames[0].save(
            p, save_all=True, append_images=frames[1:], duration=100
        )
        for pi in range(2):
            mos = float(rng.uniform(10, 90))
            rows_per_p[pi].append(
                {
                    "video": f"videos/clip{i}.gif",
                    "id": f"clip{i}.gif->{mos:.3f}",
                    "mos": mos,
                    "conversations": [
                        {"from": "human", "value": questions[pi] + " "},
                        {"from": "gpt", "value": "The quality is good."},
                    ],
                }
            )
    for pi in range(2):
        ann = root / f"test_p{pi}.jsonl"
        ann.write_text(
            "".join(json.dumps(r) + "\n" for r in rows_per_p[pi])
        )
        meta = root / f"meta_p{pi}.json"
        meta.write_text(
            json.dumps(
                {
                    f"persp{pi}": {
                        "root": str(root),
                        "annotation": str(ann),
                        "repeat_time": 1,
                        "data_augment": False,
                    }
                }
            )
        )
        metas.append(str(meta))
    return metas, str(root)


def _common_args(meta, out_dir):
    return [
        "--model_scale", "tiny", "--meta_path", meta,
        "--output_dir", out_dir, "--max_seq_length", "256",
        "--bf16", "False", "--num_segments", "4",
        "--dataloader_num_workers", "1", "--group_by_length", "False",
        "--drop_path_rate", "0.0", "--eval_batch_size", "2",
    ]


def test_fused_matches_single_perspective_eval(two_perspective_meta, tmp_path):
    from aigv_assessor_tpu.cli import stage2_eval

    metas, _root = two_perspective_meta

    # fused: both perspectives in one pass
    fused_dir = str(tmp_path / "fused")
    stage2_eval.main(
        _common_args(metas[0], fused_dir)
        + ["--fused_meta_paths", metas[1]]
    )
    import csv

    fused_scores = []
    for pi in range(2):
        path = os.path.join(fused_dir, f"results_p{pi + 1}.csv")
        with open(path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5
        fused_scores.append({r["video_name"]: float(r["pred_score"]) for r in rows})
        metrics = open(
            os.path.join(fused_dir, f"metrics_p{pi + 1}.txt")
        ).read()
        assert "SRCC_score:" in metrics

    # reference path: one ordinary eval per perspective
    for pi in range(2):
        solo_dir = str(tmp_path / f"solo{pi}")
        stage2_eval.main(_common_args(metas[pi], solo_dir))
        with open(os.path.join(solo_dir, "results.csv")) as f:
            rows = list(csv.DictReader(f))
        solo = {r["video_name"]: float(r["pred_score"]) for r in rows}
        assert set(solo) == set(fused_scores[pi])
        for v, s in solo.items():
            np.testing.assert_allclose(
                fused_scores[pi][v], s, rtol=1e-4, atol=1e-4,
                err_msg=f"perspective {pi} video {v} drifted from the "
                        f"single-perspective eval",
            )


def test_fused_rejects_mismatched_videos(two_perspective_meta, tmp_path):
    """Pairing integrity: different video lists across perspectives fail
    loudly instead of silently mis-pairing labels."""
    from aigv_assessor_tpu.cli.common import build_model_and_tokenizer
    from aigv_assessor_tpu.data.dataset import build_datasets
    from aigv_assessor_tpu.train.evaluate import evaluate_perspectives
    from types import SimpleNamespace

    metas, root = two_perspective_meta
    # rewrite perspective 1 with a shuffled video order
    ann = json.loads(open(metas[1]).read())
    key = list(ann)[0]
    rows = [
        json.loads(l)
        for l in open(ann[key]["annotation"])
        if l.strip()
    ]
    rows = rows[::-1]
    bad_ann = tmp_path / "bad.jsonl"
    bad_ann.write_text("".join(json.dumps(r) + "\n" for r in rows))
    ann[key]["annotation"] = str(bad_ann)
    bad_meta = tmp_path / "bad_meta.json"
    bad_meta.write_text(json.dumps(ann))

    args = SimpleNamespace(
        model_name_or_path="", model_scale="tiny", max_seq_length=256,
        bf16=False, seed=0, down_sample_ratio=0.5, ps_version="v2",
        vision_select_layer=-1, conv_style="internlm2-chat",
        max_dynamic_patch=6, min_dynamic_patch=1, dynamic_image_size=True,
        use_thumbnail=True, pad2square=False, use_backbone_lora=0,
        use_llm_lora=0, drop_path_rate=0.0, force_image_size=448,
        grad_checkpoint=False, vision_path=None, llm_path=None, mlp_path=None,
    )
    config, model, params, tok = build_model_and_tokenizer(args, stage=2)
    ds = [
        build_datasets(m, tok, config, split="eval", num_segments=4,
                       mos_scale=1.0)
        for m in (metas[0], str(bad_meta))
    ]
    with pytest.raises(AssertionError, match="pairs a different video"):
        evaluate_perspectives(model, params, ds, batch_size=2)


def test_fused_eval_w8a8(two_perspective_meta, tmp_path):
    """--eval_w8a8 runs the fused eval at the W8A8 serving precision and
    produces scores close to bf16 (int8 quantization drift is bounded;
    exactness is covered per-op in tests/test_w8a8.py)."""
    from aigv_assessor_tpu.cli import stage2_eval

    metas, _root = two_perspective_meta
    base_dir = str(tmp_path / "base")
    stage2_eval.main(
        _common_args(metas[0], base_dir) + ["--fused_meta_paths", metas[1]]
    )
    q_dir = str(tmp_path / "q")
    stage2_eval.main(
        _common_args(metas[0], q_dir)
        + ["--fused_meta_paths", metas[1], "--eval_w8a8", "True"]
    )
    import csv

    for pi in range(2):
        rows_b = list(csv.DictReader(
            open(os.path.join(base_dir, f"results_p{pi + 1}.csv"))
        ))
        rows_q = list(csv.DictReader(
            open(os.path.join(q_dir, f"results_p{pi + 1}.csv"))
        ))
        assert len(rows_q) == len(rows_b) == 5
        b = {r["video_name"]: float(r["pred_score"]) for r in rows_b}
        q = {r["video_name"]: float(r["pred_score"]) for r in rows_q}
        assert set(b) == set(q)
        spread = max(abs(v) for v in b.values()) or 1.0
        for v in b:
            assert abs(b[v] - q[v]) <= 0.15 * spread + 0.05, (
                f"perspective {pi} video {v}: w8a8 {q[v]} vs bf16 {b[v]}"
            )
