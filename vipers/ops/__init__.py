from vipers.ops.flash_attention import flash_attention, attention_reference  # noqa: F401
