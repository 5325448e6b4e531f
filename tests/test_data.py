"""Data pipeline tests: frame index math, template rendering, label masking,
tokenizer round-trips, collation, samplers."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.data.collator import collate
from aigv_assessor_tpu.data.constants import IGNORE_TOKEN_ID, IMG_CONTEXT_TOKEN
from aigv_assessor_tpu.data.conversation import get_conv_template
from aigv_assessor_tpu.data.preprocess import (
    expand_image_tokens,
    preprocess_internlm,
    render_conversation,
)
from aigv_assessor_tpu.data.sampler import (
    LengthGroupedSampler,
    ShardedBatchSampler,
    get_length_grouped_indices,
)
from aigv_assessor_tpu.data.tokenizer import build_test_tokenizer
from aigv_assessor_tpu.data.video import (
    dynamic_preprocess,
    get_frame_indices,
    transform_frames,
)

CONVS = [
    {"from": "human", "value": "How would you rate the static quality of this video? "},
    {"from": "gpt", "value": "The static quality of the video is excellent."},
]


@pytest.fixture(scope="module")
def tok():
    return build_test_tokenizer(model_max_length=512)


class TestFrameIndices:
    def test_uniform_middles(self):
        """Exact port of get_index math (stage1_train.py:488-500)."""
        idx = get_frame_indices(8, fps=30.0, max_frame=239)
        seg = 239.0 / 8  # end_idx is the last frame INDEX (stage1_train.py:494)
        want = np.array(
            [int(0 + seg / 2 + np.round(seg * i)) for i in range(8)]
        )
        np.testing.assert_array_equal(idx, want)
        assert idx.max() <= 239

    def test_bound(self):
        idx = get_frame_indices(4, fps=10.0, max_frame=99, bound=(1.0, 5.0))
        assert idx.min() >= 10 and idx.max() <= 50


class TestTemplates:
    def test_internlm2_prompt_layout(self):
        conv = get_conv_template("internlm2-chat")
        conv.append_message(conv.roles[0], "hi")
        conv.append_message(conv.roles[1], "hello")
        p = conv.get_prompt()
        assert p.startswith("<|im_start|>system\n")
        assert "<|im_start|>user\nhi<|im_end|>" in p
        assert "<|im_start|>assistant\nhello<|im_end|>" in p

    def test_render_conversation(self):
        text = render_conversation("internlm2-chat", CONVS)
        assert "How would you rate the static quality of this video?" in text
        assert text.endswith("The static quality of the video is excellent.<|im_end|>")

    def test_expand_image_tokens(self):
        text = "a <image>\nb <image>"
        out = expand_image_tokens(text, [3, 1])
        assert out == (
            "a <img><IMG_CONTEXT><IMG_CONTEXT><IMG_CONTEXT></img>\n"
            "b <img><IMG_CONTEXT></img>"
        )


class TestPreprocessInternLM:
    def _video_convs(self, n_frames=8):
        special = "\n".join(f"Frame{i+1}: <image>" for i in range(n_frames))
        special += "\nMotion Feature: <image>"
        return [
            {"from": "human", "value": special + "\nHow would you rate the static quality of this video? "},
            {"from": "gpt", "value": "The static quality of the video is excellent."},
        ]

    def test_mask_covers_only_answer(self, tok):
        convs = self._video_convs(2)
        num_tokens = [4, 4, 1]
        (res,) = preprocess_internlm(
            "internlm2-chat", [convs], tok, num_tokens
        )
        assert not res.mismatch
        # unmasked labels must decode to the answer + sep
        kept = res.labels[res.labels != IGNORE_TOKEN_ID]
        decoded = tok.decode(kept)
        assert "The static quality of the video is excellent." in decoded
        # everything before the assistant role is masked
        conv = get_conv_template("internlm2-chat")
        n_ctx = (np.asarray(res.input_ids) == tok.img_context_token_id).sum()
        assert n_ctx == 2 * 4 + 1
        # ctx positions must all be masked
        ctx_pos = np.asarray(res.input_ids) == tok.img_context_token_id
        assert np.all(res.labels[ctx_pos] == IGNORE_TOKEN_ID)

    def test_padded_to_max_length(self, tok):
        (res,) = preprocess_internlm(
            "internlm2-chat", [self._video_convs(1)], tok, [4, 1]
        )
        assert len(res.input_ids) == tok.model_max_length
        assert res.attention_mask.sum() < tok.model_max_length
        # pads are masked
        assert np.all(res.labels[~res.attention_mask] == IGNORE_TOKEN_ID)


class TestTokenizer:
    def test_specials_single_token(self, tok):
        for t in ("<img>", "</img>", IMG_CONTEXT_TOKEN):
            ids = tok.encode(t, add_bos=False)
            assert len(ids) == 1, t

    def test_bos_prefix(self, tok):
        ids = tok.encode("good")
        assert ids[0] == tok.bos_token_id

    def test_roundtrip(self, tok):
        s = "The static quality of the video is poor."
        assert tok.decode(tok.encode(s, add_bos=False)) == s


class TestTransform:
    def test_resize_normalize(self):
        img = Image.new("RGB", (100, 60), (124, 116, 104))  # ~imagenet mean
        out = transform_frames([img], input_size=32)
        assert out.shape == (1, 32, 32, 3)
        assert abs(out.mean()) < 0.1  # roughly zero after normalize

    def test_dynamic_preprocess_max1(self):
        img = Image.new("RGB", (640, 360))
        tiles = dynamic_preprocess(img, max_num=1, image_size=64, use_thumbnail=True)
        assert len(tiles) == 1 and tiles[0].size == (64, 64)

    def test_dynamic_preprocess_tiling(self):
        img = Image.new("RGB", (640, 320))
        tiles = dynamic_preprocess(img, max_num=6, image_size=64, use_thumbnail=True)
        assert len(tiles) == 3  # 2x1 tiles + thumbnail


class TestCollator:
    def _sample(self, n, t=2):
        from aigv_assessor_tpu.data.dataset import Sample

        return Sample(
            video_name=f"v{n}",
            answer="a",
            mos=0.5,
            input_ids=np.arange(1, n + 1, dtype=np.int32),
            labels=np.arange(1, n + 1, dtype=np.int32),
            attention_mask=np.ones(n, bool),
            pixel_values=np.zeros((t, 8, 8, 3), np.float32),
            image_flags=np.ones(t, np.int32),
        )

    def test_pad_and_bucket(self):
        batch = collate([self._sample(10), self._sample(200)], seq_multiple=128)
        assert batch.input_ids.shape == (2, 256)
        assert batch.labels[0, 10:].tolist() == [-100] * 246
        assert batch.input_ids[0, 10:].sum() == 0
        assert batch.attention_mask[1, :200].all()
        assert batch.pixel_values.shape == (2, 2, 8, 8, 3)

    def test_static_pad_to(self):
        batch = collate([self._sample(5)], pad_to=64)
        assert batch.input_ids.shape == (1, 64)


class TestSamplers:
    def test_length_grouped_covers_all(self):
        lengths = list(np.random.default_rng(0).integers(10, 100, 64))
        idx = get_length_grouped_indices(lengths, 4, 2, np.random.default_rng(1))
        assert sorted(idx) == list(range(64))

    def test_sharded_batches(self):
        bs = ShardedBatchSampler(20, global_batch_size=8, num_processes=2,
                                 process_index=1, shuffle=False)
        batches = list(bs)
        assert len(batches) == 2
        assert batches[0] == [4, 5, 6, 7]

    def test_sharded_with_length_sampler(self):
        ls = LengthGroupedSampler([5] * 16, batch_size=2, world_size=2)
        bs = ShardedBatchSampler(ls, global_batch_size=4, num_processes=1)
        seen = [i for b in bs for i in b]
        assert sorted(seen) == list(range(16))


class TestDatasetEnd2End:
    def test_video_dataset_gif(self, tok, tmp_path):
        """Full host path: GIF -> frames -> prompt -> sample (uses a real
        animated GIF fixture; mp4 path exercised in integration tests)."""
        from aigv_assessor_tpu.data.dataset import VideoQualityDataset

        gif = tmp_path / "clip.gif"
        frames = [
            Image.new("RGB", (64, 48), (i * 25, 10, 10)) for i in range(10)
        ]
        frames[0].save(gif, save_all=True, append_images=frames[1:], duration=100)

        ann = tmp_path / "ann.jsonl"
        row = {
            "video": "clip.gif",
            "id": "clip.gif->61.2",
            "mos": 61.2,
            "conversations": CONVS,
        }
        ann.write_text(json.dumps(row) + "\n")

        cfg = AssessorConfig.tiny().replace(force_image_size=56)
        ds = VideoQualityDataset(
            str(ann), tok, cfg, root=str(tmp_path), is_train=False, num_segments=4
        )
        s = ds[0]
        assert s.pixel_values.shape == (4, 56, 56, 3)
        assert s.mos == pytest.approx(61.2)
        n_ctx = (s.input_ids == tok.img_context_token_id).sum()
        assert n_ctx == 4 * cfg.num_image_token + 1
        assert s.image_flags.tolist() == [1, 1, 1, 1]

    def test_mos_from_id_suffix(self):
        from aigv_assessor_tpu.data.dataset import parse_mos

        assert parse_mos({"id": "x.mp4->42.5"}) == 42.5
        assert parse_mos({"mos": 3.0, "id": "y"}) == 3.0
        with pytest.raises(KeyError):
            parse_mos({"id": "nomos"})


class TestTurnPreprocessors:
    def test_mpt_masks_only_answers(self, tok):
        from aigv_assessor_tpu.data.preprocess import preprocess_mpt
        from aigv_assessor_tpu.data.constants import IGNORE_TOKEN_ID

        convs = [
            {"from": "human", "value": "How would you rate the static quality of this video? "},
            {"from": "gpt", "value": "The static quality of the video is good."},
        ]
        (res,) = preprocess_mpt("Hermes-2", [convs], tok, [])
        kept = res.labels[res.labels != IGNORE_TOKEN_ID]
        if not res.mismatch:
            decoded = tok.decode(kept)
            assert "good" in decoded
            assert "How would you rate" not in decoded

    def test_phi3_no_crash_and_pad_masked(self, tok):
        from aigv_assessor_tpu.data.preprocess import preprocess_phi3
        from aigv_assessor_tpu.data.constants import IGNORE_TOKEN_ID

        convs = [
            {"from": "human", "value": "rate this"},
            {"from": "gpt", "value": "The static quality of the video is poor."},
        ]
        (res,) = preprocess_phi3("phi3-chat", [convs], tok, [])
        assert len(res.input_ids) == tok.model_max_length
        assert np.all(res.labels[~res.attention_mask] == IGNORE_TOKEN_ID)


class TestStorage:
    def test_register_and_dispatch(self):
        from aigv_assessor_tpu.data import storage

        calls = []

        def fake(path):
            calls.append(path)
            import io
            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (8, 8)).save(buf, format="PNG")
            return buf.getvalue()

        storage.register_loader("fake://", fake)
        img = storage.open_image("fake://bucket/x.png")
        assert img.size == (8, 8)
        assert calls == ["fake://bucket/x.png"]

    def test_unregistered_remote_raises(self):
        from aigv_assessor_tpu.data import storage

        with pytest.raises(IOError):
            storage.open_bytes("s3missing://bucket/y.bin")


class _WordTokenizer:
    """Linear word-level tokenizer: encode(a)+encode(b) == encode(a+b) for
    space-joined text, which is the property the plain (vicuna-style)
    masker's token-count arithmetic assumes of llama tokenizers."""

    def __init__(self, max_len=64):
        self.model_max_length = max_len
        self.pad_token_id = 0
        self.legacy = True
        self.vocab = {"<pad>": 0, "<s>": 1}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab)
        return self.vocab[w]

    def encode(self, text, add_bos=False):
        words = []
        for w in text.split():
            while w.endswith("</s>") and w != "</s>":
                w = w[: -len("</s>")]
                words.append(w)
                w = "</s>"
            words.append(w)
        ids = [self._id(w) for w in words]
        return ([1] + ids) if add_bos else ids

    def decode(self, ids):
        rev = {v: k for k, v in self.vocab.items()}
        return " ".join(rev.get(int(i), "?") for i in ids)


class TestPreprocessPlain:
    """The 4th masker (reference `dataset.py:287-389`), dispatched for any
    template other than the 3 named ones (`stage1_train.py:465-466`)."""

    def test_dispatch(self):
        from aigv_assessor_tpu.data.preprocess import (
            get_preprocess_function,
            preprocess_plain,
        )

        assert get_preprocess_function("internvl_zh") is preprocess_plain
        with pytest.raises(NotImplementedError):
            get_preprocess_function("no-such-template")

    def test_internvl_zh_prompt_layout(self):
        conv = get_conv_template("internvl_zh")
        conv.append_message(conv.roles[0], "hello")
        conv.append_message(conv.roles[1], "world")
        # INTERNVL_ZH: seps = [sep2, sep] (reference conversation.py:229-236)
        assert conv.get_prompt() == " <human>: hello <bot>: world</s>"

    def test_answer_kept_question_masked(self):
        """On a linear tokenizer the turn arithmetic aligns: the assistant
        answer survives, the user question is masked, no mismatch."""
        from aigv_assessor_tpu.data.conversation import (
            Conversation,
            register_conv_template,
        )
        from aigv_assessor_tpu.data.preprocess import preprocess_plain

        register_conv_template(
            Conversation(
                name="vicuna-test",
                system_message="A chat.",
                roles=("USER", "ASSISTANT"),
                sep=" ",
                sep2="</s>",
                sep_style="add_colon_two",
            ),
            override=True,
        )
        tok = _WordTokenizer()
        convs = [
            {"from": "human", "value": "rate this video now"},
            {"from": "gpt", "value": "quality is excellent truly"},
        ]
        (res,) = preprocess_plain(
            "vicuna-test", [convs], tok, [], text_only=True
        )
        assert not res.mismatch
        kept = tok.decode(res.labels[res.labels != IGNORE_TOKEN_ID])
        for w in ["quality", "is", "excellent"]:
            assert w in kept, (w, kept)
        for w in ["rate", "this", "video"]:
            assert w not in kept, (w, kept)
        # pads masked
        assert np.all(res.labels[~res.attention_mask] == IGNORE_TOKEN_ID)

    def test_internvl_zh_space_sep2_masks_all(self):
        """Faithful quirk: internvl_zh's sep2 is ' ', so the plain masker's
        turn split degenerates and the sample is fully masked with the
        mismatch flag set (same as the reference would do)."""
        from aigv_assessor_tpu.data.preprocess import preprocess_plain

        tok = _WordTokenizer()
        convs = [
            {"from": "human", "value": "rate this"},
            {"from": "gpt", "value": "excellent"},
        ]
        (res,) = preprocess_plain("internvl_zh", [convs], tok, [], text_only=True)
        assert res.mismatch
        assert np.all(res.labels == IGNORE_TOKEN_ID)


class TestWeightedConcatDeterminism:
    """The concat dataset must index DETERMINISTICALLY (reference
    WeightedConcatDataset is a ConcatDataset; randomness lives in the train
    sampler) — eval over a multi-entry meta has to visit every sample
    exactly once, and per-process shard disjointness depends on it."""

    class _Toy:
        def __init__(self, tag, n):
            self.items = [f"{tag}{i}" for i in range(n)]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    def test_covers_every_sample_once(self):
        from aigv_assessor_tpu.data.dataset import WeightedConcatDataset

        ds = WeightedConcatDataset([self._Toy("a", 3), self._Toy("b", 5)])
        assert len(ds) == 8
        got = [ds[i] for i in range(len(ds))]
        assert got == ["a0", "a1", "a2", "b0", "b1", "b2", "b3", "b4"]
        # repeatable
        assert [ds[i] for i in range(len(ds))] == got
        with pytest.raises(IndexError):
            ds[8]

    def test_sampler_len_matches_iteration_without_drop_last(self):
        from aigv_assessor_tpu.data.sampler import ShardedBatchSampler

        s = ShardedBatchSampler(10, global_batch_size=4, drop_last=False)
        assert len(s) == len(list(iter(s))) == 3
        s2 = ShardedBatchSampler(10, global_batch_size=4, drop_last=True)
        assert len(s2) == len(list(iter(s2))) == 2


class TestDecayMask:
    def test_bias_and_norms_excluded(self):
        """HF Trainer excludes biases and norm weights from weight decay;
        the optax mask must match (reference Trainer.create_optimizer)."""
        from aigv_assessor_tpu.train.trainer import decay_mask

        params = {
            "attention": {"wqkv": {"kernel": 1.0, "bias": 1.0}},
            "attention_norm": {"weight": 1.0},
            "mlp1": {"ln": {"scale": 1.0, "bias": 1.0}, "fc": {"kernel": 1.0}},
            "tok_embeddings": {"embedding": 1.0},
        }
        m = decay_mask(params)
        assert m["attention"]["wqkv"]["kernel"] is True
        assert m["attention"]["wqkv"]["bias"] is False
        assert m["attention_norm"]["weight"] is False
        assert m["mlp1"]["ln"]["scale"] is False
        assert m["mlp1"]["ln"]["bias"] is False
        assert m["mlp1"]["fc"]["kernel"] is True
        assert m["tok_embeddings"]["embedding"] is True
