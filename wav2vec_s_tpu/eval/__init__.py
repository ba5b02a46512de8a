from wav2vec_s_tpu.eval.wer import wer, corpus_wer
from wav2vec_s_tpu.eval.bleu import corpus_bleu
