"""Dataset sources: transcript synth/cache readers, testdata readers."""
