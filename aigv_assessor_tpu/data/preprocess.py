"""Prompt assembly + label masking.

Behavioral port of `preprocess_internlm`
(`/root/reference/internvl/train/dataset.py:595-682`), the preprocessor
selected for the `internlm2-chat` template (`stage1_train.py:458-467`):

1. render the conversation through the template,
2. expand each `<image>` into `<img>` + N x `<IMG_CONTEXT>` + `</img>`
   (N = 256 per frame, 1 for the motion slot),
3. tokenize padded to `model_max_length`,
4. mask everything except assistant answers with -100, using the reference's
   token-count arithmetic: bos masked, `parts = text.split(assistant_role)`,
   each prefix re-tokenized to find span lengths (each length minus 1 for the
   leading bos the tokenizer re-adds),
5. on a count mismatch the reference silently zeroes the sample's labels with
   a warning (`dataset.py:672-676`); we keep that behavior but surface it in
   the return value so callers can fail loudly (SURVEY.md §0 notes the
   reference's silent retry loop is a bug to avoid).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

from aigv_assessor_tpu.data.constants import (
    IGNORE_TOKEN_ID,
    IMG_CONTEXT_TOKEN,
    IMG_END_TOKEN,
    IMG_START_TOKEN,
)
from aigv_assessor_tpu.data.conversation import get_conv_template
from aigv_assessor_tpu.data.tokenizer import AIGVTokenizer


@dataclass
class PreprocessedSample:
    input_ids: np.ndarray  # [S] int32
    labels: np.ndarray  # [S] int32
    attention_mask: np.ndarray  # [S] bool
    mismatch: bool = False


def render_conversation(
    template_name: str,
    conversations: Sequence[Dict[str, str]],
    strip_values: bool = False,
) -> str:
    """[{'from': 'human'|'gpt', 'value': ...}] -> full prompt text.

    `strip_values` mirrors the reference, which strips message values ONLY
    in `preprocess_internlm` (`dataset.py:621`) — the other three maskers
    render values verbatim."""
    conv = get_conv_template(template_name)
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    source = list(conversations)
    if roles[source[0]["from"]] != conv.roles[0]:
        source = source[1:]
    for j, sentence in enumerate(source):
        role = roles[sentence["from"]]
        assert role == conv.roles[j % 2], "conversation roles must alternate"
        value = sentence["value"].strip() if strip_values else sentence["value"]
        conv.append_message(role, value)
    return conv.get_prompt()


def expand_image_tokens(
    conversation: str, num_image_token_list: Sequence[int]
) -> str:
    """Replace each '<image>' with <img><IMG_CONTEXT>*n</img> in order
    (reference `dataset.py:624-631`)."""
    for n in num_image_token_list:
        image_tokens = f"{IMG_START_TOKEN}{IMG_CONTEXT_TOKEN * n}{IMG_END_TOKEN}"
        conversation = conversation.replace("<image>", image_tokens, 1)
    return conversation


def preprocess_internlm(
    template_name: str,
    sources: Sequence[Sequence[Dict[str, str]]],
    tokenizer: AIGVTokenizer,
    num_image_token_list: Sequence[int],
    text_only: bool = False,
    group_by_length: bool = False,
    ds_name: str = None,
) -> List[PreprocessedSample]:
    conv = get_conv_template(template_name)
    conversations = [
        render_conversation(template_name, s, strip_values=True) for s in sources
    ]
    if not text_only:
        conversations = [
            expand_image_tokens(c, num_image_token_list) for c in conversations
        ]

    max_len = tokenizer.model_max_length
    pad_id = tokenizer.pad_token_id
    results = []
    for conversation in conversations:
        ids = tokenizer.encode(conversation)
        if len(ids) > max_len:
            ids = ids[:max_len]
        real_len = len(ids)
        if not group_by_length:
            ids = ids + [pad_id] * (max_len - len(ids))
        input_ids = np.asarray(ids, np.int32)
        target = input_ids.copy()

        # --- masking arithmetic (reference dataset.py:643-676) ---
        # pads share the eos id, so count non-pad positions like the
        # reference's `ne(pad_token_id)` (which also counts the real eos as
        # pad — we use the known real length instead, which is exact)
        total_len = real_len
        cur_len = 1
        target[:cur_len] = IGNORE_TOKEN_ID  # bos
        parts = conversation.split(conv.roles[1])
        info = parts[0] + conv.roles[1]
        temp_len = len(tokenizer.encode(info)) - 1
        target[cur_len : cur_len + temp_len] = IGNORE_TOKEN_ID
        cur_len += temp_len

        for index in range(1, len(parts) - 1):
            info = parts[index]
            part1, part2 = info.split(conv.roles[0], 1)
            temp_len = len(tokenizer.encode(part1)) - 1
            cur_len += temp_len
            part = conv.roles[0] + part2 + conv.roles[1]
            temp_len = len(tokenizer.encode(part)) - 1
            target[cur_len : cur_len + temp_len] = IGNORE_TOKEN_ID
            cur_len += temp_len
        last_info = parts[-1]
        temp_len = len(tokenizer.encode(last_info)) - 1
        cur_len += temp_len

        target[cur_len:] = IGNORE_TOKEN_ID
        mismatch = False
        if cur_len < max_len and cur_len != total_len:
            target[:] = IGNORE_TOKEN_ID
            mismatch = True

        attention_mask = np.zeros(input_ids.shape, bool)
        attention_mask[:real_len] = True
        results.append(
            PreprocessedSample(
                input_ids=input_ids,
                labels=target.astype(np.int32),
                attention_mask=attention_mask,
                mismatch=mismatch,
            )
        )
    return results


def _preprocess_turns(
    template_name: str,
    sources: Sequence[Sequence[Dict[str, str]]],
    tokenizer: AIGVTokenizer,
    num_image_token_list: Sequence[int],
    text_only: bool = False,
    group_by_length: bool = False,
    ds_name: str = None,
    *,
    add_bos: bool,
    turn_len_fn,
    instr_len_fn,
    start_offset: int,
    mask_endoftext: bool = False,
) -> List[PreprocessedSample]:
    """Shared turn-splitting masker behind `preprocess_mpt`
    (`dataset.py:392-486`: no bos, offsets 0) and `preprocess_phi3`
    (`dataset.py:489-592`: bos-adjusted offsets, <|endoftext|> masked):
    turns are regrouped as [system+user+gpt, user+gpt, ...] by splitting at
    the separator, each turn's instruction prefix masked by re-tokenized
    length."""
    conv = get_conv_template(template_name)
    conversations = [render_conversation(template_name, s) for s in sources]
    if not text_only:
        conversations = [
            expand_image_tokens(c, num_image_token_list) for c in conversations
        ]

    max_len = tokenizer.model_max_length
    pad_id = tokenizer.pad_token_id
    sep = conv.sep + conv.roles[1]
    results = []
    for conversation in conversations:
        ids = tokenizer.encode(conversation, add_bos=add_bos)
        if len(ids) > max_len:
            ids = ids[:max_len]
        real_len = len(ids)
        if not group_by_length:
            ids = ids + [pad_id] * (max_len - len(ids))
        input_ids = np.asarray(ids, np.int32)
        target = input_ids.copy()

        turns = conversation.split(conv.sep)
        re_turns = [conv.sep.join(turns[:3])]
        for idx in range(3, len(turns), 2):
            re_turns.append(conv.sep.join(turns[idx : idx + 2]))
        cur_len = start_offset
        target[:cur_len] = IGNORE_TOKEN_ID
        if mask_endoftext:
            eot = tokenizer.convert_tokens_to_ids("<|endoftext|>")
            if eot is not None:
                target[target == eot] = IGNORE_TOKEN_ID

        def tok_len(text):
            return len(tokenizer.encode(text, add_bos=add_bos))

        mismatch = False
        for i, turn in enumerate(re_turns):
            if turn == "":
                break
            turn_len = turn_len_fn(tok_len(turn), i)
            parts = turn.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            instruction_len = instr_len_fn(tok_len(parts[0]), i)
            target[cur_len : cur_len + instruction_len] = IGNORE_TOKEN_ID
            cur_len += turn_len
        target[cur_len:] = IGNORE_TOKEN_ID

        if cur_len < max_len and cur_len != real_len:
            target[:] = IGNORE_TOKEN_ID
            mismatch = True

        attention_mask = np.zeros(input_ids.shape, bool)
        attention_mask[:real_len] = True
        results.append(
            PreprocessedSample(
                input_ids=input_ids,
                labels=target.astype(np.int32),
                attention_mask=attention_mask,
                mismatch=mismatch,
            )
        )
    return results


def preprocess_mpt(*args, **kw) -> List[PreprocessedSample]:
    """Hermes-2 masker (reference `preprocess_mpt`, `dataset.py:392-486`):
    no bos; every turn costs len(tokens)+1 (the separator consumed by the
    split); instruction prefix is its raw token length."""
    return _preprocess_turns(
        *args,
        **kw,
        add_bos=False,
        start_offset=0,
        turn_len_fn=lambda n, i: n + 1,
        instr_len_fn=lambda n, i: n,
        mask_endoftext=False,
    )


def preprocess_phi3(*args, **kw) -> List[PreprocessedSample]:
    """phi3-chat masker (reference `preprocess_phi3`, `dataset.py:489-592`):
    bos-counted lengths (turn: raw for the first, -1 after; instruction: -1
    first, -2 after), <|endoftext|> masked, cur_len starts past bos."""
    return _preprocess_turns(
        *args,
        **kw,
        add_bos=True,
        start_offset=1,
        turn_len_fn=lambda n, i: n if i == 0 else n - 1,
        instr_len_fn=lambda n, i: n - 1 if i == 0 else n - 2,
        mask_endoftext=True,
    )


def preprocess_plain(
    template_name: str,
    sources: Sequence[Sequence[Dict[str, str]]],
    tokenizer: AIGVTokenizer,
    num_image_token_list: Sequence[int],
    text_only: bool = False,
    group_by_length: bool = False,
    ds_name: str = None,
) -> List[PreprocessedSample]:
    """The reference's generic (fastchat/vicuna-style) masker
    (`/root/reference/internvl/train/dataset.py:287-389`), selected for any
    template other than internlm2-chat/Hermes-2/phi3-chat
    (`stage1_train.py:465-466`) — in the shipped registry that is
    `internvl_zh`. Turns split at `conv.sep2`; instruction prefix is
    `sep + roles[1] + ': '`; llama-tokenizer offsets (-2, and -1 per turn in
    non-legacy mode) reproduced exactly."""
    conv = get_conv_template(template_name)
    conversations = [render_conversation(template_name, s) for s in sources]
    if not text_only:
        conversations = [
            expand_image_tokens(c, num_image_token_list) for c in conversations
        ]

    max_len = tokenizer.model_max_length
    pad_id = tokenizer.pad_token_id
    sep = conv.sep + conv.roles[1] + ": "
    legacy = bool(getattr(tokenizer, "legacy", True))
    results = []
    for conversation in conversations:
        ids = tokenizer.encode(conversation, add_bos=True)
        if len(ids) > max_len:
            ids = ids[:max_len]
        real_len = len(ids)
        if not group_by_length:
            ids = ids + [pad_id] * (max_len - len(ids))
        input_ids = np.asarray(ids, np.int32)
        target = input_ids.copy()

        turns = conversation.split(conv.sep2)
        cur_len = 1
        target[:cur_len] = IGNORE_TOKEN_ID
        mismatch = False
        for i, turn in enumerate(turns):
            if turn == "":
                break
            turn_len = len(tokenizer.encode(turn, add_bos=True))
            parts = turn.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            # "-2" is the reference's hardcoded llama-tokenizer offset
            instruction_len = len(tokenizer.encode(parts[0], add_bos=True)) - 2
            if i != 0 and not legacy:
                instruction_len -= 1
            target[cur_len : cur_len + instruction_len] = IGNORE_TOKEN_ID
            cur_len += turn_len
            if i != 0 and not legacy:
                cur_len -= 1
        target[cur_len:] = IGNORE_TOKEN_ID

        if cur_len < max_len and cur_len != real_len:
            target[:] = IGNORE_TOKEN_ID
            mismatch = True

        attention_mask = np.zeros(input_ids.shape, bool)
        attention_mask[:real_len] = True
        results.append(
            PreprocessedSample(
                input_ids=input_ids,
                labels=target.astype(np.int32),
                attention_mask=attention_mask,
                mismatch=mismatch,
            )
        )
    return results


PREPROCESSORS = {
    "internlm2-chat": preprocess_internlm,
    "Hermes-2": preprocess_mpt,
    "phi3-chat": preprocess_phi3,
}


def get_preprocess_function(template_name: str):
    """Reference `get_preprocess_function` (`stage1_train.py:458-467`):
    3 named maskers, every other registered template falls through to the
    plain `preprocess` (here `preprocess_plain`)."""
    try:
        return PREPROCESSORS[template_name]
    except KeyError:
        # match the reference's else-branch; unknown template names still
        # fail loudly at get_conv_template
        from aigv_assessor_tpu.data.conversation import _TEMPLATES

        if template_name in _TEMPLATES:
            return preprocess_plain
        raise NotImplementedError(
            f"no preprocessor for template {template_name!r}"
        ) from None
