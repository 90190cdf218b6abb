"""Signal decoders (the reference's decoder_modules/ analog)."""
