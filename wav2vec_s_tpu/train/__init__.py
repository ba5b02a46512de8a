from wav2vec_s_tpu.train.criterion import wav2vec_loss
