"""Chat templating (Jinja).

Capability parity with the reference's from-scratch Jinja2-subset engine
(/root/reference/src/tokenizer/ChatTemplate.{h,cpp}, ~1.8k LoC): rendering
HF `chat_template` strings over messages with add_generation_prompt,
bos/eos context vars, raise_exception / strftime_now / namespace, loop
vars, whitespace control, filters and string methods.

The reference hand-rolled a lexer/parser/evaluator because C++ has no
Jinja; in Python the idiomatic equivalent is the sandboxed jinja2
environment (exactly what HF transformers uses), configured for HF
semantics. Same capability, zero bespoke parser to maintain.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, List, Optional

import jinja2
from jinja2.sandbox import ImmutableSandboxedEnvironment


class ChatTemplateError(ValueError):
    pass


def _raise_exception(message: str):
    raise ChatTemplateError(message)


def _strftime_now(fmt: str) -> str:
    return datetime.now().strftime(fmt)


def _tojson(value, indent=None, separators=None, sort_keys=False,
            ensure_ascii=False):
    import json

    return json.dumps(value, indent=indent, separators=separators,
                      sort_keys=sort_keys, ensure_ascii=ensure_ascii)


_ENV: Optional[ImmutableSandboxedEnvironment] = None


def _env() -> ImmutableSandboxedEnvironment:
    global _ENV
    if _ENV is None:
        env = ImmutableSandboxedEnvironment(
            trim_blocks=True,
            lstrip_blocks=True,
            extensions=["jinja2.ext.loopcontrols"],
        )
        env.globals["raise_exception"] = _raise_exception
        env.globals["strftime_now"] = _strftime_now
        env.filters["tojson"] = _tojson
        env.policies["json.dumps_kwargs"] = {"sort_keys": False,
                                             "ensure_ascii": False}
        _ENV = env
    return _ENV


# Default ChatML template, the same fallback the reference server uses when
# the model ships no template but has <|im_start|>/<|im_end|> in vocab
# (server/ChatTemplateUtils.cpp:11-17).
CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|im_start|>assistant\n' }}"
    "{% endif %}"
)


class ChatTemplate:
    """A compiled chat template bound to bos/eos context."""

    def __init__(self, template: str, bos_token: str = "", eos_token: str = "",
                 pad_token: str = "", unk_token: str = ""):
        self.source = template
        self.bos_token = bos_token
        self.eos_token = eos_token
        self.pad_token = pad_token
        self.unk_token = unk_token
        try:
            self._compiled = _env().from_string(template)
        except jinja2.TemplateError as e:
            raise ChatTemplateError(f"invalid chat template: {e}") from e

    def render(
        self,
        messages: List[Dict[str, Any]],
        add_generation_prompt: bool = False,
        tools: Optional[list] = None,
        **extra_context,
    ) -> str:
        ctx = dict(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=self.bos_token,
            eos_token=self.eos_token,
            pad_token=self.pad_token,
            unk_token=self.unk_token,
        )
        if tools is not None:
            ctx["tools"] = tools
        ctx.update(extra_context)
        try:
            return self._compiled.render(**ctx)
        except ChatTemplateError:
            raise
        except jinja2.TemplateError as e:
            raise ChatTemplateError(f"chat template render failed: {e}") from e
