"""Conversation template rendering parity
(contract: crates/core/tests/conversation_templates.rs +
crates/core/src/conversation/mod.rs)."""

import pytest

from dsocr_tpu.core import (
    ConversationTemplate,
    SeparatorStyle,
    get_conv_template,
    register_conv_template,
    render_prompt,
    normalize_text,
)


def test_deepseek_template_basic():
    conv = get_conv_template("deepseek")
    assert conv is not None
    conv.append_message("<|User|>", "<image>\nFree OCR.")
    conv.append_message("<|Assistant|>", None)
    prompt = conv.get_prompt()
    assert prompt == "<|User|>: <image>\nFree OCR.\n\n<|Assistant|>:"


def test_deepseek_template_with_system():
    conv = get_conv_template("deepseek")
    conv.set_system_message("You are a helpful OCR assistant.")
    conv.append_message("<|User|>", "hello")
    conv.append_message("<|Assistant|>", "hi")
    prompt = conv.get_prompt()
    assert prompt == (
        "You are a helpful OCR assistant.\n\n"
        "<|User|>: hello\n\n"
        "<|Assistant|>: hi<｜end▁of▁sentence｜>"
    )


def test_deepseek_sep_alternation():
    conv = get_conv_template("deepseek")
    conv.append_message("<|User|>", "a")
    conv.append_message("<|Assistant|>", "b")
    conv.append_message("<|User|>", "c")
    conv.append_message("<|Assistant|>", None)
    assert conv.get_prompt() == (
        "<|User|>: a\n\n<|Assistant|>: b<｜end▁of▁sentence｜>"
        "<|User|>: c\n\n<|Assistant|>:"
    )


def test_plain_template():
    conv = get_conv_template("plain")
    conv.append_message("", "<image>\nOCR this.")
    conv.append_message("", None)
    assert conv.get_prompt() == "<image>\nOCR this."
    assert conv.stop_str == ["</s>"]
    assert conv.stop_token_ids == [100001]


def test_alignment_template():
    conv = get_conv_template("alignment")
    conv.append_message("", "the image content is ignored at idx 0")
    conv.append_message("", "caption text")
    assert conv.get_prompt() == "<image>\ncaption text"


def test_deepseekv2_style_via_registry_copy():
    conv = get_conv_template("deepseekv2")
    assert conv.sep == ""
    assert conv.sep2 == "<｜end▁of▁sentence｜>"
    conv.append_message("<｜User｜>", "q")
    conv.append_message("<｜Assistant｜>", None)
    assert conv.get_prompt() == "<｜User｜>: q<｜Assistant｜>:"


def test_deepseek_v2_sep_style_rendering():
    conv = ConversationTemplate(
        name="v2style",
        sep_style=SeparatorStyle.DEEPSEEK_V2,
        sep="<sep1>",
        sep2="<sep2>",
    )
    conv.append_message("User", "question")
    conv.append_message("Assistant", "answer")
    assert conv.get_prompt() == "<｜sft▁begin｜>\nquestion<sep1>answer<sep2>"


def test_whitespace_only_message_treated_as_empty():
    conv = get_conv_template("deepseek")
    conv.append_message("<|User|>", "   ")
    assert conv.get_prompt() == "<|User|>:"


def test_registry_copy_isolation():
    a = get_conv_template("deepseek")
    a.append_message("<|User|>", "x")
    b = get_conv_template("deepseek")
    assert b.messages == []


def test_register_duplicate_raises():
    t = ConversationTemplate(name="deepseek")
    with pytest.raises(ValueError):
        register_conv_template(t, override_existing=False)


def test_register_custom_and_fetch():
    t = ConversationTemplate(name="custom-test-tpl", sep="|")
    register_conv_template(t, override_existing=True)
    assert get_conv_template("custom-test-tpl").sep == "|"


def test_render_prompt():
    # render_prompt appends literal "User"/"Assistant" roles
    # (ref inference.rs:218-219), not the template's roles tuple.
    out = render_prompt("deepseek", "", "<image>\nFree OCR.")
    assert out == "User: <image>\nFree OCR.\n\nAssistant:"


def test_render_prompt_unknown_template():
    with pytest.raises(ValueError):
        render_prompt("nope", "", "x")


def test_normalize_text():
    assert normalize_text("hello\r\nworld<｜end▁of▁sentence｜>\n") == "hello\nworld"
