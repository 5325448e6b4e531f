"""Evaluation artifact tests: exact CSV/metrics formats, level mapping,
answer-span decode."""

import csv

import numpy as np
import pytest

from aigv_assessor_tpu.data.constants import IGNORE_TOKEN_ID
from aigv_assessor_tpu.train.evaluate import (
    correlation_metrics,
    decode_answer_span,
    save_and_evaluate,
    word_to_level,
)


class TestWordToLevel:
    @pytest.mark.parametrize(
        "text,level",
        [
            ("the video is bad", 1),
            ("poor quality here", 2),
            ("looks fair to me", 3),
            ("this is good", 4),
            ("excellent work", 5),
            ("no quality word", 0),
        ],
    )
    def test_mapping(self, text, level):
        assert word_to_level(text) == level

    def test_reference_priority_order(self):
        # the reference checks bad->poor->fair->good->excellent in order
        # (stage1_train.py:260-275): 'bad' wins when both appear
        assert word_to_level("good and bad") == 1


class FakeTok:
    def decode(self, ids, skip_special_tokens=False):
        return " ".join(str(int(i)) for i in ids)


class TestDecodeSpan:
    def test_span_selection(self):
        """With labels [-100.., a, b, im_end] the decoded span is the argmax
        predictions at the len(filtered)+1..1 positions from the real end
        (stage1_train.py:242-260)."""
        im_end = 99
        # real_len = 8 -> shift arrays have 7 valid positions
        shift_labels = np.array([-100, -100, -100, -100, 5, 6, im_end, -100, -100])
        preds = np.array([10, 11, 12, 13, 14, 15, 16, 17, 18])
        out = decode_answer_span(FakeTok(), preds, shift_labels, real_len=8, im_end_id=im_end)
        # filtered = [5, 6] -> take preds[real-1-3 : real-1-1] = positions 4,5
        assert out == "14 15"

    def test_empty_answer(self):
        shift_labels = np.full(5, IGNORE_TOKEN_ID)
        preds = np.arange(5)
        assert decode_answer_span(FakeTok(), preds, shift_labels, 5, 99) == ""


class TestSaveAndEvaluate:
    def test_stage1_artifacts(self, tmp_path):
        rows = [
            ["v1.mp4", "The video is good.", "good", 70.0, 4],
            ["v2.mp4", "The video is bad.", "bad", 20.0, 1],
            ["v3.mp4", "The video is fair.", "excellent", 50.0, 5],
        ]
        out_csv = str(tmp_path / "r.csv")
        out_txt = str(tmp_path / "m.txt")
        metrics = save_and_evaluate(rows, out_csv, out_txt, stage=1)

        with open(out_csv) as f:
            reader = list(csv.reader(f))
        assert reader[0] == ["video_name", "answer", "output", "mos", "level"]
        assert len(reader) == 4
        # substring accuracy: 'good' in answer1 yes, 'bad' in answer2 yes,
        # 'excellent' in answer3 no -> 2/3
        assert metrics["accuracy"] == pytest.approx(2 / 3)
        text = open(out_txt).read()
        for key in ("Accuracy:", "SRCC:", "PLCC:", "KRCC:"):
            assert key in text

    def test_stage2_artifacts_append_mode(self, tmp_path):
        rows = [
            ["v1.mp4", "a good one", "good", 70.0, 4, 0.71],
            ["v2.mp4", "a bad one", "bad", 20.0, 1, 0.19],
        ]
        out_csv = str(tmp_path / "r.csv")
        out_txt = str(tmp_path / "m.txt")
        m1 = save_and_evaluate(rows, out_csv, out_txt, stage=2)
        m2 = save_and_evaluate(rows, out_csv, out_txt, stage=2)
        with open(out_csv) as f:
            header = f.readline().strip().split(",")
        assert header[-1] == "pred_score"
        assert "SRCC_score" in m1 and m1["SRCC_score"] == pytest.approx(1.0)
        # metrics TXT is append-mode (reference stage1_train.py:324-328)
        lines = open(out_txt).read().count("Accuracy:")
        assert lines == 2


class TestCorrelations:
    def test_perfect_monotone(self):
        m = correlation_metrics([1, 2, 3, 4], [10, 20, 30, 40])
        assert m["SRCC"] == pytest.approx(1.0)
        assert m["KRCC"] == pytest.approx(1.0)
