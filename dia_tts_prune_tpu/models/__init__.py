"""Model families: the Dia encoder-decoder transformer and the DAC neural
audio codec (JAX ports designed for TPU execution)."""
