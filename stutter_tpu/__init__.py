"""stutter_tpu: a TPU-native (JAX/XLA/Pallas) speech-dysfluency recognition framework.

A from-scratch rebuild of the capabilities of
kishormb/Recognizing-Speech-Dysfluencies-in-Stuttering (see SURVEY.md):
audio denoising, librosa-parity DSP feature extraction, dysfluency
classification (MLP/CNN/CNN-BiLSTM on TPU; RF/SVM host baselines),
evaluation/reporting, caching, and serving — redesigned TPU-first.
"""

__version__ = "0.1.0"
