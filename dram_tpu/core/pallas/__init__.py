from .window_attention import stencil_attention_pallas  # noqa: F401
