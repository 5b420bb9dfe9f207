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


# -- per-feature matrix (port of test_chat_template.cpp:13-512) ------------
#
# Each case: (template, expected, msgs-or-None, extra-special-tokens).
# None msgs = the default MSGS fixture; [] = empty message list.

U2 = [{"role": "user", "content": "A"}, {"role": "user", "content": "B"}]
FEATURES = [
    # basics
    ("{{ bos_token }}Hello", "<s>Hello", [], {"bos_token": "<s>"}),
    ("Just text", "Just text", [], {}),
    ("{{ 'literal' }}", "literal", [], {}),
    ("{{ bos_token }}|{{ eos_token }}", "<s>|</s>",
     [], {"bos_token": "<s>", "eos_token": "</s>"}),
    ("{% if add_generation_prompt %}GEN{% endif %}", "", [], {}),
    # for loops
    ("{% for m in messages %}<{{ m.role }}>{% endfor %}",
     "<user><user>", U2, {}),
    ("{% for m in messages %}{{ loop.index0 }}{{ m.content }}{% endfor %}",
     "0A1B", U2, {}),
    ("{% for m in messages %}{% if loop.first %}F{% endif %}"
     "{{ m.content }}{% if loop.last %}L{% endif %}{% endfor %}",
     "FABL", U2, {}),
    ("{% for m in messages %}{{ loop.index }}{% endfor %}", "12", U2, {}),
    # conditionals / operators
    ("{% if 1 == 2 %}a{% elif 2 == 2 %}b{% else %}c{% endif %}",
     "b", [], {}),
    ("{% if 'a' != 'b' %}NE{% endif %}", "NE", [], {}),
    ("{% if true and true %}AND{% endif %}", "AND", [], {}),
    ("{% if false or true %}OR{% endif %}", "OR", [], {}),
    ("{% if not false %}NOT{% endif %}", "NOT", [], {}),
    # whitespace control
    ("a  {%- if true %} b{% endif %}", "a b", [], {}),
    ("{% if true %}b  {%- endif %}c", "bc", [], {}),
    ("x  {%- if true -%}  y  {%- endif -%}  z", "xyz", [], {}),
    ("{{- 'v' -}}  ", "v", [], {}),
    # filters
    ("{{ '  pad  ' | trim }}", "pad", [], {}),
    ("{{ messages | length }}", "2", U2, {}),
    ("{{ 'up' | upper }}", "UP", [], {}),
    ("{{ 'DOWN' | lower }}", "down", [], {}),
    ("{{ missing | default('dflt') }}", "dflt", [], {}),
    ("{{ messages | first | length }}", "2", U2, {}),  # dict of 2 keys
    # concat & arithmetic
    ("{{ 'a' ~ 'b' ~ 1 }}", "ab1", [], {}),
    ("{{ 'a' + 'b' }}", "ab", [], {}),
    ("{% set x = 'v' %}{{ x }}", "v", [], {}),
    ("{{ 7 % 3 }}", "1", [], {}),
    ("{% if 3 > 2 and 2 >= 2 and 1 < 2 and 2 <= 2 %}CMP{% endif %}",
     "CMP", [], {}),
    ("{{ 5 - 3 }}", "2", [], {}),
    # tests
    ("{% if messages is defined %}DEF{% endif %}", "DEF", [], {}),
    ("{% if nothing is not defined %}UNDEF{% endif %}", "UNDEF", [], {}),
    ("{% if none is none %}YES{% endif %}", "YES", [], {}),
    # HF semantics (jinja2 Undefined): an undefined name is NOT none —
    # deliberate divergence from the reference's minja-style engine
    # (test_chat_template.cpp:404 expects YES there); HF transformers
    # renders "" and this framework pins HF behavior.
    ("{% if unknown is none %}YES{% endif %}", "", [], {}),
    ("{% if bos_token is not none %}YES{% endif %}",
     "YES", [], {"bos_token": "<s>"}),
    # escapes
    ("line1\\nline2", "line1\\nline2", [], {}),
    ("{{ 'a\nb' }}", "a\nb", [], {}),
    # nesting
    ("{% for m in messages %}{% if m.content == 'A' %}[{{ m.content }}]"
     "{% else %}{{ m.content }}{% endif %}{% endfor %}", "[A]B", U2, {}),
    # empty messages
    ("{% for m in messages %}X{% endfor %}", "", [], {}),
    # string methods
    ("{{ '  hello  '.strip() }}", "hello", [], {}),
    ("{{ 'a-b-c'.split('-')[1] }}", "b", [], {}),
    ("{{ 'hello</think>world'.split('</think>')[-1] }}", "world", [], {}),
    ("{{ '\nhello'.lstrip('\n') }}", "hello", [], {}),
    ("{{ 'hello\n'.rstrip('\n') }}", "hello", [], {}),
    ("{% if 'hello world'.startswith('hello') %}YES{% endif %}",
     "YES", [], {}),
    ("{% if 'hello world'.endswith('world') %}YES{% endif %}",
     "YES", [], {}),
    # scoping: plain set inside for does NOT leak (namespace() does)
    ("{% set count = 0 %}{% for m in messages %}"
     "{% set count = loop.index %}{% endfor %}{{ count }}", "0", U2, {}),
    ("{% set ns = namespace(n=0) %}{% for m in messages %}"
     "{% set ns.n = loop.index %}{% endfor %}{{ ns.n }}", "2", U2, {}),
    # membership
    ("{% if 'hello' in 'hello world' %}YES{% endif %}", "YES", [], {}),
    ("{% if 'xyz' not in 'hello world' %}YES{% endif %}", "YES", [], {}),
    # indexing
    ("{{ messages[-1].content }}", "B", U2, {}),
    ("{{ messages[0]['role'] }}", "user", U2, {}),
    # undefined access is falsy, not an error
    ("{% for m in messages %}{% if m.tool_calls %}HAS{% else %}NO"
     "{% endif %}{% endfor %}", "NONO", U2, {}),
    ("{% if tools %}HAS{% else %}NO{% endif %}", "NO", [], {}),
]


@pytest.mark.parametrize("tpl,expected,msgs,extra", FEATURES,
                         ids=[f"f{i}" for i in range(len(FEATURES))])
def test_feature_matrix(tpl, expected, msgs, extra):
    out = ChatTemplate(tpl, **extra).render(
        msgs if msgs is not None else MSGS, add_generation_prompt=False
    )
    assert out == expected


def test_whitespace_control_realistic():
    """test_chat_template.cpp:323-351 verbatim semantics."""
    tpl = (
        "{%- for message in messages %}"
        "{%- if message.role == 'user' -%}"
        "User: {{ message.content }}\n"
        "{% elif message.role == 'assistant' -%}"
        "Assistant: {{ message.content }}\n"
        "{% endif -%}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}"
        "Assistant: "
        "{% endif -%}"
    )
    msgs = [
        {"role": "user", "content": "Hello"},
        {"role": "assistant", "content": "Hi there"},
        {"role": "user", "content": "How are you?"},
    ]
    out = ChatTemplate(tpl).render(msgs, add_generation_prompt=True)
    assert out == ("User: Hello\nAssistant: Hi there\n"
                   "User: How are you?\nAssistant: ")


def test_add_generation_prompt_flag():
    t = "{% if add_generation_prompt %}GEN{% else %}NOGEN{% endif %}"
    assert render(t, gen=True) == "GEN"
    assert render(t, gen=False) == "NOGEN"


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


def test_qwen3_simple_user_exact():
    """Qwen3 injects NO default system prompt (unlike Qwen2.5) —
    test_chat_template.cpp:659-674 exact string."""
    tpl = ChatTemplate(_asset_template("Qwen3-0.6B"), eos_token="<|im_end|>")
    out = tpl.render([{"role": "user", "content": "Hello!"}],
                     add_generation_prompt=True)
    assert out == "<|im_start|>user\nHello!<|im_end|>\n<|im_start|>assistant\n"


def test_qwen3_multi_turn_exact():
    tpl = ChatTemplate(_asset_template("Qwen3-0.6B"), eos_token="<|im_end|>")
    msgs = [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": "What is 1+1?"},
        {"role": "assistant", "content": "The answer is 2."},
        {"role": "user", "content": "Thanks!"},
    ]
    out = tpl.render(msgs, add_generation_prompt=True)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nWhat is 1+1?<|im_end|>\n"
        "<|im_start|>assistant\nThe answer is 2.<|im_end|>\n"
        "<|im_start|>user\nThanks!<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_qwen3_no_gen_prompt_exact():
    tpl = ChatTemplate(_asset_template("Qwen3-0.6B"), eos_token="<|im_end|>")
    msgs = [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": "Hello!"},
    ]
    out = tpl.render(msgs, add_generation_prompt=False)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nHello!<|im_end|>\n"
    )


def test_qwen25_multi_turn_exact():
    tpl = ChatTemplate(_asset_template("Qwen2.5-3B"), eos_token="<|im_end|>")
    msgs = [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": "What is 1+1?"},
        {"role": "assistant", "content": "The answer is 2."},
        {"role": "user", "content": "Thanks!"},
    ]
    out = tpl.render(msgs, add_generation_prompt=True)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nWhat is 1+1?<|im_end|>\n"
        "<|im_start|>assistant\nThe answer is 2.<|im_end|>\n"
        "<|im_start|>user\nThanks!<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


DS_BOS = "<｜begin▁of▁sentence｜>"
DS_EOS = "<｜end▁of▁sentence｜>"


def _ds_template():
    return ChatTemplate(
        _asset_template("DeepSeek-R1-Distill-Llama-8B"),
        bos_token=DS_BOS, eos_token=DS_EOS,
    )


def test_deepseek_r1_simple_user_exact():
    out = _ds_template().render([{"role": "user", "content": "Hello!"}],
                                add_generation_prompt=True)
    assert out == DS_BOS + "<｜User｜>Hello!<｜Assistant｜><think>\n"


def test_deepseek_r1_with_system_exact():
    out = _ds_template().render(
        [{"role": "system", "content": "You are a helpful assistant."},
         {"role": "user", "content": "Hello!"}],
        add_generation_prompt=True,
    )
    assert out == (DS_BOS + "You are a helpful assistant."
                   "<｜User｜>Hello!<｜Assistant｜><think>\n")


def test_deepseek_r1_multi_turn_exact():
    out = _ds_template().render(
        [{"role": "system", "content": "You are a helpful assistant."},
         {"role": "user", "content": "What is 1+1?"},
         {"role": "assistant", "content": "The answer is 2."},
         {"role": "user", "content": "Thanks!"}],
        add_generation_prompt=True,
    )
    assert out == (
        DS_BOS + "You are a helpful assistant."
        "<｜User｜>What is 1+1?<｜Assistant｜>The answer is 2." + DS_EOS +
        "<｜User｜>Thanks!<｜Assistant｜><think>\n"
    )


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


# -- template -> tokenizer roundtrip (cpp:739-775; the Qwen/DeepSeek asset
# dirs here ship only tokenizer_config.json, so the roundtrip runs each
# production template against the FULL tokenizers that do exist) ----------

@pytest.mark.parametrize("asset,template_asset", [
    ("gpt2", "Qwen2.5-3B"),
    ("Mistral-7B-v0.3", "DeepSeek-R1-Distill-Llama-8B"),
])
def test_template_then_encode_roundtrip(asset, template_asset):
    from tinygpt_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_dir(reference_asset(asset))
    tok.set_chat_template(_asset_template(template_asset))
    text = tok.apply_chat_template([{"role": "user", "content": "Hi"}],
                                   add_generation_prompt=True)
    assert text
    ids = tok.encode(text, add_special_tokens=False)
    assert ids
    assert tok.decode(ids) == text
