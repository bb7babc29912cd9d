"""Pallas TPU kernels for the paths where XLA's default lowering leaves
performance on the table: the polyphase filterbank fold (removes the
gather's 8x HBM amplification) and remote-DMA halo exchange."""
