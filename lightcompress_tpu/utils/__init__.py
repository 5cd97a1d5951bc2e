from .quant_analysis import analyze_blocks, cosine_sim, kurtosis  # noqa: F401
