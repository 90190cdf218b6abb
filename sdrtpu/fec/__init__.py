"""Forward error correction: Viterbi, Reed-Solomon, symbol decoders."""
