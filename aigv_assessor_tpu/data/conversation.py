"""Chat prompt templates.

Behavioral port of the template registry in
`/root/reference/internvl/conversation.py` for the templates the pipeline
actually selects (`get_preprocess_function`, `stage1_train.py:458-467`):
`internlm2-chat` (lines 371-387), `phi3-chat` (390-405) and `Hermes-2`
(MPT-style). All three use the MPT separator style: the prompt is

    <system_template with system_message><sep>
    <role0><message><sep><role1><message><sep>...

and an open assistant turn ends with the bare role string.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class Conversation:
    name: str
    system_template: str = "{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    sep: str = "\n"
    stop_token_ids: Optional[List[int]] = None
    messages: List[Tuple[str, Optional[str]]] = dataclasses.field(default_factory=list)

    def get_prompt(self) -> str:
        system = self.system_template.format(system_message=self.system_message)
        ret = system + self.sep
        for role, message in self.messages:
            if message is not None:
                ret += role + message + self.sep
            else:
                ret += role
        return ret

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append((role, message))

    def copy(self) -> "Conversation":
        return Conversation(
            name=self.name,
            system_template=self.system_template,
            system_message=self.system_message,
            roles=self.roles,
            sep=self.sep,
            stop_token_ids=(
                list(self.stop_token_ids) if self.stop_token_ids else None
            ),
            messages=[],
        )


_TEMPLATES: Dict[str, Conversation] = {}


def register_conv_template(template: Conversation, override: bool = False) -> None:
    if not override and template.name in _TEMPLATES:
        raise ValueError(f"template {template.name} already registered")
    _TEMPLATES[template.name] = template


def get_conv_template(name: str) -> Conversation:
    return _TEMPLATES[name].copy()


# `internlm2-chat` (reference `conversation.py:371-387`); the system message
# is part of the data contract (tokenized into every sample).
register_conv_template(
    Conversation(
        name="internlm2-chat",
        system_template="<|im_start|>system\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
            "英文名叫InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep="<|im_end|>",
        stop_token_ids=[2, 92543, 92542],
    )
)

# `phi3-chat` (reference `conversation.py:390-405`)
register_conv_template(
    Conversation(
        name="phi3-chat",
        system_template="<|system|>\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
            "英文名叫InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|user|>\n", "<|assistant|>\n"),
        sep="<|end|>",
        stop_token_ids=[2, 32000, 32007],
    )
)

# `Hermes-2` (reference `conversation.py:238-247`, MPT style)
register_conv_template(
    Conversation(
        name="Hermes-2",
        system_template="<|im_start|>system\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
            "英文名叫InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep="<|im_end|>",
        stop_token_ids=[2, 6, 7, 8],
    )
)
