"""Byte-parity of all four label maskers against the REFERENCE code itself.

The real InternLM2/Hermes/Phi-3 vocab files are not redistributable, so
fixed recorded tokenizations can't cover the brittle token-count arithmetic
(`/root/reference/internvl/train/dataset.py:287-682`) against every
tokenizer behavior. Instead the reference's own `preprocess*` functions are
imported (read-only, heavy deps stubbed) and run as a differential ORACLE
over the same tokenizer our maskers use: token-for-token equality of
input_ids and labels across fuzzed multi-turn conversations, image-token
expansion, truncation, and legacy/non-legacy modes. A one-token drift in
any masker fails here.

A committed golden-fixture replay (tests/fixtures/masker_golden.json,
generated from this oracle by tests/fixtures/gen_masker_golden.py) covers
the same cases without needing /root/reference mounted.
"""

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

from aigv_assessor_tpu.data.preprocess import (
    preprocess_internlm,
    preprocess_mpt,
    preprocess_phi3,
    preprocess_plain,
)
from aigv_assessor_tpu.data.tokenizer import AIGVTokenizer

REFERENCE_ROOT = "/root/reference"
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------------------------ oracle --


def _stub(name, **attrs):
    import importlib.machinery as im

    m = types.ModuleType(name)
    m.__spec__ = im.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def reference_dataset_module():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not mounted")
    saved = {k: sys.modules.get(k) for k in (
        "torchvision", "torchvision.transforms",
        "torchvision.transforms.functional", "decord", "cv2", "imageio",
    )}
    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tvf = _stub("torchvision.transforms.functional", InterpolationMode=object)
    tv.transforms = tvt
    tvt.functional = tvf
    _stub("decord", VideoReader=object)
    if "cv2" not in sys.modules or saved["cv2"] is None:
        _stub("cv2")
    if "imageio" not in sys.modules or saved["imageio"] is None:
        _stub("imageio")
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        mod = importlib.import_module("internvl.train.dataset")
        yield mod
    finally:
        sys.path.remove(REFERENCE_ROOT)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class HFStyleShim:
    """Minimal transformers-PreTrainedTokenizer surface the reference
    maskers touch, backed by the same Rust tokenizer our maskers use.
    `add_bos` mirrors the per-family convention the reference arithmetic
    assumes (InternLM2/Llama spm add <s>; Hermes-2's Qwen-style BPE does
    not)."""

    def __init__(self, tk: AIGVTokenizer, add_bos: bool, legacy: bool = True):
        self._tk = tk
        self.add_bos = add_bos
        self.legacy = legacy
        self.model_max_length = tk.model_max_length
        self.pad_token_id = tk.pad_token_id
        self.unk_token_id = tk.convert_tokens_to_ids(tk.unk_token)
        self.padding_side = "right"

    def convert_tokens_to_ids(self, token):
        return self._tk.convert_tokens_to_ids(token)

    def __call__(
        self, text, return_tensors=None, padding=False, max_length=None,
        truncation=False,
    ):
        import torch

        texts = [text] if isinstance(text, str) else list(text)
        out = []
        for t in texts:
            ids = self._tk.encode(t, add_bos=self.add_bos)
            if truncation and max_length and len(ids) > max_length:
                ids = ids[:max_length]
            if padding == "max_length":
                ids = ids + [self.pad_token_id] * (max_length - len(ids))
            out.append(ids)

        class Enc:
            pass

        enc = Enc()
        if return_tensors == "pt":
            enc.input_ids = torch.tensor(out, dtype=torch.long)
        else:
            enc.input_ids = out[0] if isinstance(text, str) else out
        return enc

    def decode(self, ids, **kw):
        return self._tk.decode([int(i) for i in ids])


def build_parity_tokenizer(model_max_length=160) -> AIGVTokenizer:
    """Deterministic tokenizer from the committed fixture file (stable ids
    across library versions) with every chat-control string in the corpus."""
    from tokenizers import Tokenizer

    path = os.path.join(FIXTURE_DIR, "parity_tokenizer.json")
    tk = AIGVTokenizer(
        Tokenizer.from_file(path), model_max_length=model_max_length
    )
    return tk


def fuzz_cases():
    """Deterministic conversation battery: turn counts, unicode, whitespace
    (strip-sensitivity), image expansion, truncation pressure."""
    q1 = "How would you rate the static quality of this video?"
    q_img = "<image>\n<image>\nMotion Feature: <image>\n" + q1
    a1 = "The static quality of the video is good."
    a2 = "The temporal smoothness of the video is poor."
    cases = []
    cases.append(("text1", [
        {"from": "human", "value": q1},
        {"from": "gpt", "value": a1},
    ], True))
    cases.append(("text2turn", [
        {"from": "human", "value": q1},
        {"from": "gpt", "value": a1},
        {"from": "human", "value": "And the temporal smoothness?"},
        {"from": "gpt", "value": a2},
    ], True))
    cases.append(("unicode", [
        {"from": "human", "value": "这个视频的质量如何？"},
        {"from": "gpt", "value": "视频质量很好。 Excellent!"},
    ], True))
    cases.append(("whitespace", [
        {"from": "human", "value": "  " + q1 + "  "},
        {"from": "gpt", "value": " " + a1 + "\n"},
    ], True))
    cases.append(("image", [
        {"from": "human", "value": q_img},
        {"from": "gpt", "value": a1},
    ], False))
    cases.append(("threeturn", [
        {"from": "human", "value": "Rate it."},
        {"from": "gpt", "value": "Good."},
        {"from": "human", "value": "Why?"},
        {"from": "gpt", "value": "Because the frames are sharp."},
        {"from": "human", "value": "Score?"},
        {"from": "gpt", "value": "Four."},
    ], True))
    return cases


ORACLES = [
    # (name, template, our_fn, ref_fn_name, add_bos)
    ("internlm", "internlm2-chat", preprocess_internlm, "preprocess_internlm", True),
    ("mpt", "Hermes-2", preprocess_mpt, "preprocess_mpt", False),
    ("phi3", "phi3-chat", preprocess_phi3, "preprocess_phi3", True),
    ("plain", "internvl_zh", preprocess_plain, "preprocess", True),
]


def run_pair(ref_mod, name, template, our_fn, ref_fn_name, add_bos, legacy,
             max_len=160):
    tk = build_parity_tokenizer(model_max_length=max_len)
    shim = HFStyleShim(tk, add_bos=add_bos, legacy=legacy)
    ref_fn = getattr(ref_mod, ref_fn_name)
    results = []
    for case_name, conv, text_only in fuzz_cases():
        num_tokens = [4, 4, 1]
        import copy

        ours = our_fn(
            template, [copy.deepcopy(conv)], tk, num_tokens,
            text_only=text_only,
        )[0]
        ref = ref_fn(
            template, [copy.deepcopy(conv)], shim, num_tokens,
            text_only=text_only, num_image=len(num_tokens),
        )
        ref_ids = ref["input_ids"][0].numpy().astype(np.int64)
        ref_labels = ref["labels"][0].numpy().astype(np.int64)
        results.append((case_name, ours, ref_ids, ref_labels))
    return results


@pytest.mark.parametrize("name,template,our_fn,ref_fn_name,add_bos", ORACLES)
def test_masker_matches_reference_oracle(
    reference_dataset_module, name, template, our_fn, ref_fn_name, add_bos
):
    for case_name, ours, ref_ids, ref_labels in run_pair(
        reference_dataset_module, name, template, our_fn, ref_fn_name,
        add_bos, legacy=True,
    ):
        np.testing.assert_array_equal(
            ours.input_ids.astype(np.int64), ref_ids,
            err_msg=f"input_ids drift: masker={name} case={case_name}",
        )
        np.testing.assert_array_equal(
            ours.labels.astype(np.int64), ref_labels,
            err_msg=f"label drift: masker={name} case={case_name}",
        )


def test_plain_masker_non_legacy_mode(reference_dataset_module):
    """tokenizer.legacy=False changes the offsets in the generic masker
    (`dataset.py:355-366`) — both modes must match."""
    name, template, our_fn, ref_fn_name, add_bos = ORACLES[3]
    tk = build_parity_tokenizer()
    tk.legacy = False
    shim = HFStyleShim(tk, add_bos=add_bos, legacy=False)
    ref_fn = getattr(reference_dataset_module, ref_fn_name)
    import copy

    for case_name, conv, text_only in fuzz_cases():
        ours = our_fn(
            template, [copy.deepcopy(conv)], tk, [4, 4, 1],
            text_only=text_only,
        )[0]
        ref = ref_fn(
            template, [copy.deepcopy(conv)], shim, [4, 4, 1],
            text_only=text_only, num_image=3,
        )
        np.testing.assert_array_equal(
            ours.labels.astype(np.int64),
            ref["labels"][0].numpy().astype(np.int64),
            err_msg=f"non-legacy label drift: case={case_name}",
        )


def test_truncation_parity(reference_dataset_module):
    """max_length shorter than the conversation: truncated ids and the
    trailing-mask arithmetic must agree."""
    for name, template, our_fn, ref_fn_name, add_bos in ORACLES:
        for case_name, ours, ref_ids, ref_labels in run_pair(
            reference_dataset_module, name, template, our_fn, ref_fn_name,
            add_bos, legacy=True, max_len=24,
        ):
            np.testing.assert_array_equal(
                ours.input_ids.astype(np.int64), ref_ids,
                err_msg=f"truncated ids drift: masker={name} case={case_name}",
            )
            np.testing.assert_array_equal(
                ours.labels.astype(np.int64), ref_labels,
                err_msg=f"truncated label drift: masker={name} case={case_name}",
            )


# ------------------------------------------------- committed golden replay --


def test_golden_fixture_replay():
    """Replays the committed oracle recordings (generated by
    tests/fixtures/gen_masker_golden.py from the reference code) so the
    parity contract holds even without /root/reference mounted."""
    path = os.path.join(FIXTURE_DIR, "masker_golden.json")
    with open(path) as f:
        golden = json.load(f)
    fns = {
        "internlm": preprocess_internlm,
        "mpt": preprocess_mpt,
        "phi3": preprocess_phi3,
        "plain": preprocess_plain,
    }
    for entry in golden:
        tk = build_parity_tokenizer(model_max_length=entry["max_len"])
        if not entry["legacy"]:
            tk.legacy = False
        our = fns[entry["masker"]](
            entry["template"], [entry["conversation"]], tk,
            entry["num_image_token_list"], text_only=entry["text_only"],
        )[0]
        np.testing.assert_array_equal(
            our.input_ids.astype(np.int64), np.asarray(entry["input_ids"]),
            err_msg=f"golden ids drift: {entry['masker']}/{entry['case']}",
        )
        np.testing.assert_array_equal(
            our.labels.astype(np.int64), np.asarray(entry["labels"]),
            err_msg=f"golden label drift: {entry['masker']}/{entry['case']}",
        )
