from infinite_texture_gans_tpu.train.losses import d_loss_fake, d_loss_real, g_loss
from infinite_texture_gans_tpu.train.train_loop import train
