from stutter_tpu.io.wav import load_mono, read_wav, write_wav
