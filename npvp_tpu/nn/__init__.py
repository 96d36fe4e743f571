from npvp_tpu.nn.layers import (BatchNorm, ConvBNAct, DropPath,
                                LayerNormHWC, MultiHeadAttention,
                                TokenLayerNorm, reflect_pad_2d,
                                scaled_dot_product_attention)
from npvp_tpu.nn.losses import (bi_patch_nce_loss, gdl_loss, kl_divergence,
                                l1_loss, mse_loss, temporal_diff_loss)
from npvp_tpu.nn.neural_process import (NRMLP, EventEncoder, pos_feat_fuse)
from npvp_tpu.nn.resnet_ae import (Factorized3DConvAttn, FrameAutoEncoder,
                                   NonLocalAttention1D, NonLocalAttention2D,
                                   ResnetBlock, ResnetDecoder, ResnetEncoder)
from npvp_tpu.nn.vidhrformer import (MlpDWBN, SpatialWindowAttention,
                                     TemporalAttention, VidHRFormerBlockDecNAR,
                                     VidHRFormerBlockEnc, VidHRFormerDecoderNAR,
                                     VidHRFormerEncoder,
                                     encoder_temporal_allow, window_partition,
                                     window_reverse)
from npvp_tpu.nn.discriminator import (PatchDiscriminator, gan_loss,
                                       gradient_penalty)
from npvp_tpu.nn.position_encoding import (sine_position_encoding_1d,
                                           sine_position_encoding_2d,
                                           sine_position_encoding_3d)
