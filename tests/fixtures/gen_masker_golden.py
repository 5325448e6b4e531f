"""Generate the committed masker-parity fixtures.

Run offline with the reference mounted at /root/reference:

    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python tests/fixtures/gen_masker_golden.py

Produces, next to this script:
- `parity_tokenizer.json` — a deterministic small BPE tokenizer whose
  training corpus covers every chat-control string of the four templates
  (so the token-count arithmetic sees realistic merges), with
  `<|endoftext|>` and the IMG tokens as added specials.
- `masker_golden.json` — the REFERENCE maskers' (input_ids, labels) for the
  fuzz battery in tests/test_masker_parity.py, recorded through that
  tokenizer. `tests/test_masker_parity.py::test_golden_fixture_replay`
  replays these against this repo's maskers with no reference tree needed.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_and_save_parity_tokenizer(path: str):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    from aigv_assessor_tpu.data.tokenizer import AIGVTokenizer

    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    corpus = [
        # template control strings (all four registries)
        "<|im_start|>system\n<|im_start|>user\n<|im_start|>assistant\n<|im_end|>",
        "<|system|>\n<|user|>\n<|assistant|>\n<|end|>",
        "<human>: <bot>: </s>",
        # system messages
        "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
        "英文名叫InternVL, 是一个有用无害的人工智能助手。",
        "You are an AI assistant whose name is InternVL.",
        # question/answer text used by the fuzz battery
        "How would you rate the static quality of this video?",
        "And the temporal smoothness?",
        "The static quality of the video is excellent good fair poor bad.",
        "The temporal smoothness of the video is poor.",
        "这个视频的质量如何？ 视频质量很好。 Excellent!",
        "Rate it. Good. Why? Because the frames are sharp. Score? Four.",
        "Motion Feature: Frame1: Frame2:",
    ]
    trainer = trainers.BpeTrainer(
        vocab_size=3000,
        special_tokens=[
            "<unk>", "<s>", "</s>", "<|im_start|>", "<|im_end|>",
            "<|system|>", "<|user|>", "<|assistant|>", "<|end|>",
            "<|endoftext|>",
        ],
        show_progress=False,
    )
    tk.train_from_iterator(corpus, trainer)
    wrapped = AIGVTokenizer(tk)  # adds the 9 IMG/grounding specials
    wrapped._tk.save(path)
    return wrapped


def main():
    tok_path = os.path.join(HERE, "parity_tokenizer.json")
    build_and_save_parity_tokenizer(tok_path)
    print(f"wrote {tok_path}")

    import test_masker_parity as tmp

    entries = []
    gens = [
        # (masker, template, ref_fn_name, add_bos, legacy, max_len)
        ("internlm", "internlm2-chat", "preprocess_internlm", True, True, 160),
        ("mpt", "Hermes-2", "preprocess_mpt", False, True, 160),
        ("phi3", "phi3-chat", "preprocess_phi3", True, True, 160),
        ("plain", "internvl_zh", "preprocess", True, True, 160),
        ("plain", "internvl_zh", "preprocess", True, False, 160),
        ("internlm", "internlm2-chat", "preprocess_internlm", True, True, 24),
        ("mpt", "Hermes-2", "preprocess_mpt", False, True, 24),
        ("phi3", "phi3-chat", "preprocess_phi3", True, True, 24),
        ("plain", "internvl_zh", "preprocess", True, True, 24),
    ]
    # reuse the test module's reference importer
    gen_ctx = tmp.reference_dataset_module.__wrapped__()
    ref_mod = next(gen_ctx)
    try:
        import copy

        for masker, template, ref_fn_name, add_bos, legacy, max_len in gens:
            tk = tmp.build_parity_tokenizer(model_max_length=max_len)
            shim = tmp.HFStyleShim(tk, add_bos=add_bos, legacy=legacy)
            ref_fn = getattr(ref_mod, ref_fn_name)
            for case_name, conv, text_only in tmp.fuzz_cases():
                ref = ref_fn(
                    template, [copy.deepcopy(conv)], shim, [4, 4, 1],
                    text_only=text_only, num_image=3,
                )
                entries.append(
                    {
                        "masker": masker,
                        "template": template,
                        "case": case_name,
                        "conversation": conv,
                        "text_only": text_only,
                        "num_image_token_list": [4, 4, 1],
                        "legacy": legacy,
                        "max_len": max_len,
                        "input_ids": ref["input_ids"][0].tolist(),
                        "labels": ref["labels"][0].tolist(),
                    }
                )
    finally:
        gen_ctx.close()

    out = os.path.join(HERE, "masker_golden.json")
    with open(out, "w") as f:
        json.dump(entries, f)
    print(f"wrote {out}: {len(entries)} recordings")


if __name__ == "__main__":
    main()
