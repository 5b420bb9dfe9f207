from tinygpt_tpu.tokenizer.chat_template import (
    CHATML_TEMPLATE,
    ChatTemplate,
    ChatTemplateError,
)
from tinygpt_tpu.tokenizer.config import (
    AddedToken,
    TokenizerConfig,
    load_tokenizer_config,
)
from tinygpt_tpu.tokenizer.tokenizer import DecodeStream, Tokenizer

__all__ = [
    "Tokenizer",
    "DecodeStream",
    "TokenizerConfig",
    "AddedToken",
    "load_tokenizer_config",
    "ChatTemplate",
    "ChatTemplateError",
    "CHATML_TEMPLATE",
]
