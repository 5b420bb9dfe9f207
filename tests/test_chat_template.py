"""Chat template tests.

Mirrors the reference's strategy (test/test_chat_template.cpp, ~70 cases):
individual Jinja features, then real production templates rendered against
exact expected prompt strings. The production templates come from the
read-only reference assets (DeepSeek-R1 / Qwen2.5 / Qwen3
tokenizer_config.json), exercising namespace(), loop vars, whitespace
control, slicing and string methods.
"""

import json

import pytest

from tests.conftest import reference_asset
from tinygpt_tpu.tokenizer.chat_template import (
    CHATML_TEMPLATE,
    ChatTemplate,
    ChatTemplateError,
)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "What is 2+2?"},
]


def render(tpl, msgs=None, gen=False, **kw):
    return ChatTemplate(tpl, **kw).render(msgs or MSGS, add_generation_prompt=gen)


# -- individual Jinja features ---------------------------------------------

def test_variables_and_concat():
    assert render("{{ bos_token + 'x' ~ 'y' }}", bos_token="<s>") == "<s>xy"


def test_if_elif_else():
    t = "{% if a %}A{% elif b %}B{% else %}C{% endif %}"
    tpl = ChatTemplate(t)
    assert tpl.render(MSGS, a=True) == "A"
    assert tpl.render(MSGS, a=False, b=True) == "B"
    assert tpl.render(MSGS, a=False, b=False) == "C"


def test_for_loop_vars():
    t = ("{% for m in messages %}{{ loop.index0 }}:{{ m.role }}"
         "{% if not loop.last %},{% endif %}{% endfor %}")
    assert render(t) == "0:system,1:user,2:assistant,3:user"


def test_loop_first_last_length():
    t = ("{% for m in messages %}{% if loop.first %}[{% endif %}"
         "{{ loop.index }}/{{ loop.length }}"
         "{% if loop.last %}]{% endif %} {% endfor %}")
    assert render(t).strip() == "[1/4 2/4 3/4 4/4]"


def test_set_and_namespace():
    t = ("{% set ns = namespace(found=false) %}"
         "{% for m in messages %}{% if m.role == 'system' %}"
         "{% set ns.found = true %}{% endif %}{% endfor %}"
         "{{ 'yes' if ns.found else 'no' }}")
    assert render(t) == "yes"


def test_whitespace_control():
    t = "a\n  {%- if true -%}\n  b\n  {%- endif -%}\n  c"
    assert render(t) == "abc"


def test_operators_and_tests():
    assert render("{{ 'u' in messages[1]['role'] }}") == "True"
    assert render("{{ messages | length }}") == "4"
    assert render("{{ 3 % 2 }}{{ 2 + 3 }}{{ 'a' ~ 1 }}") == "15a1"
    assert render("{{ 'x' if y is defined else 'z' }}") == "z"
    assert render("{{ 'x' if messages is not none else 'z' }}") == "x"
    assert render("{{ 1 if 'abc' is string else 0 }}") == "1"


def test_slicing_negative_index():
    t = "{{ messages[-1]['content'] }}|{{ messages[:2] | length }}"
    assert render(t) == "What is 2+2?|2"


def test_filters():
    assert render("{{ ' x ' | trim | upper }}") == "X"
    assert render("{{ none | default('d', true) }}") == "d"
    assert render("{{ undefined_var | default('d') }}") == "d"
    assert render("{{ [1,2,3] | first }}{{ [1,2,3] | last }}") == "13"
    assert render("{{ 'ABC' | lower }}") == "abc"
    assert render("{{ 42 | string ~ 'x' }}") == "42x"
    assert render("{{ '7' | int + 1 }}") == "8"


def test_string_methods():
    assert render("{{ 'a b'.split(' ') | length }}") == "2"
    assert render("{{ ' pad '.strip() }}{{ 'x '.rstrip() }}{{ ' y'.lstrip() }}") == "padxy"
    assert render("{{ 'abc'.startswith('ab') }}-{{ 'abc'.endswith('z') }}") == "True-False"
    assert render("{{ 'aBc'.upper() }}{{ 'aBc'.lower() }}") == "ABCabc"
    assert render("{{ 'a,b,c'.replace(',', ';') }}") == "a;b;c"


def test_tojson_filter():
    assert render("{{ {'a': 1} | tojson }}") == '{"a": 1}'


def test_raise_exception():
    with pytest.raises(ChatTemplateError, match="boom"):
        render("{{ raise_exception('boom') }}")


def test_strftime_now():
    out = render("{{ strftime_now('%Y') }}")
    assert out.isdigit() and len(out) == 4


def test_invalid_template_rejected():
    with pytest.raises(ChatTemplateError):
        ChatTemplate("{% if x %}unclosed")


def test_sandbox_blocks_dunder_access():
    with pytest.raises(Exception):
        render("{{ ''.__class__.__mro__ }}")


# -- ChatML fallback (reference: server/ChatTemplateUtils.cpp:11-17) -------

def test_chatml_template():
    out = ChatTemplate(CHATML_TEMPLATE).render(
        MSGS[:2], add_generation_prompt=True
    )
    assert out == (
        "<|im_start|>system\nYou are helpful.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


# -- Llama-3 format (hand-written equivalent of the public format) ---------

LLAMA3_STYLE = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}"
    "{% endif %}"
)


def test_llama3_style_multiturn():
    out = ChatTemplate(LLAMA3_STYLE, bos_token="<|begin_of_text|>").render(
        MSGS, add_generation_prompt=True
    )
    assert out.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\nYou are helpful.<|eot_id|>")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert out.count("<|eot_id|>") == 4


# -- real production templates from the reference assets -------------------

def _asset_template(name):
    d = reference_asset(name)
    with open(f"{d}/tokenizer_config.json") as f:
        tc = json.load(f)
    if not tc.get("chat_template"):
        pytest.skip(f"{name} ships no chat_template")
    return tc["chat_template"]


def test_qwen25_production_template():
    tpl = ChatTemplate(_asset_template("Qwen2.5-3B"), eos_token="<|im_end|>")
    out = tpl.render(MSGS, add_generation_prompt=True)
    assert out == (
        "<|im_start|>system\nYou are helpful.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\nHello!<|im_end|>\n"
        "<|im_start|>user\nWhat is 2+2?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_qwen25_default_system_prompt():
    tpl = ChatTemplate(_asset_template("Qwen2.5-3B"), eos_token="<|im_end|>")
    out = tpl.render([{"role": "user", "content": "Hi"}],
                     add_generation_prompt=True)
    # Qwen2.5 injects its default system prompt when none is given
    assert out.startswith(
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    )
    assert out.endswith("<|im_start|>user\nHi<|im_end|>\n<|im_start|>assistant\n")


def test_qwen3_production_template():
    tpl = ChatTemplate(_asset_template("Qwen3-0.6B"), eos_token="<|im_end|>")
    out = tpl.render(MSGS, add_generation_prompt=True)
    assert out.startswith("<|im_start|>system\nYou are helpful.<|im_end|>\n")
    assert out.endswith("<|im_start|>assistant\n")
    # no generation prompt
    out2 = tpl.render(MSGS[:2], add_generation_prompt=False)
    assert not out2.endswith("<|im_start|>assistant\n")


def test_deepseek_r1_production_template():
    tpl = ChatTemplate(
        _asset_template("DeepSeek-R1-Distill-Llama-8B"),
        bos_token="<｜begin▁of▁sentence｜>",
        eos_token="<｜end▁of▁sentence｜>",
    )
    out = tpl.render(MSGS, add_generation_prompt=True)
    assert out == (
        "<｜begin▁of▁sentence｜>You are helpful."
        "<｜User｜>Hi<｜Assistant｜>Hello!<｜end▁of▁sentence｜>"
        "<｜User｜>What is 2+2?<｜Assistant｜><think>\n"
    )
