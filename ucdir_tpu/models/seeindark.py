"""UNetSeeInDark — the lightweight guidance predictor.

Parity target: /root/reference/model/ucdir.py:310-416 ("Learning to See in the
Dark" UNet): double-conv 32..512 encoder with 2x2 maxpools, ConvTranspose2d
(k=2, s=2) decoder with skip concats, LeakyReLU(0.2) written as max(0.2x, x),
1x1 output conv. Forward pads H,W to the next multiple of 32 (reflect) and
crops (ucdir.py:352-358).

TPU-native: the 2x2/stride-2 transposed conv is expressed as a per-pixel
matmul to 4*out channels + depth-to-space, which is exactly equivalent
arithmetic and maps onto the MXU without the scatter pattern of a true
conv_transpose.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ucdir_tpu.models.layers import pad_to_multiple, crop_pad


def lrelu(x):
    return jnp.maximum(0.2 * x, x)


class ConvTranspose2x2(nn.Module):
    """torch ConvTranspose2d(in, out, 2, stride=2) equivalent.

    out[b, 2y+dy, 2x+dx, o] = sum_i in[b, y, x, i] * kernel[dy, dx, i, o] + bias.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (2, 2, c, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        y = jnp.einsum('bhwi,klio->bhwklo', x, kernel,
                       preferred_element_type=x.dtype)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, self.features)
        return y + bias


class UNetSeeInDark(nn.Module):
    in_channels: int = 3
    out_channels: int = 3

    @nn.compact
    def naive_forward(self, x):
        conv = lambda f, n: nn.Conv(f, (3, 3), padding=1, name=n)
        pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))

        conv1 = lrelu(conv(32, 'conv1_1')(x))
        conv1 = lrelu(conv(32, 'conv1_2')(conv1))
        pool1 = pool(conv1)

        conv2 = lrelu(conv(64, 'conv2_1')(pool1))
        conv2 = lrelu(conv(64, 'conv2_2')(conv2))
        pool2 = pool(conv2)

        conv3 = lrelu(conv(128, 'conv3_1')(pool2))
        conv3 = lrelu(conv(128, 'conv3_2')(conv3))
        pool3 = pool(conv3)

        conv4 = lrelu(conv(256, 'conv4_1')(pool3))
        conv4 = lrelu(conv(256, 'conv4_2')(conv4))
        pool4 = pool(conv4)

        conv5 = lrelu(conv(512, 'conv5_1')(pool4))
        conv5 = lrelu(conv(512, 'conv5_2')(conv5))

        up6 = ConvTranspose2x2(256, name='upv6')(conv5)
        up6 = jnp.concatenate([up6, conv4], axis=-1)
        conv6 = lrelu(conv(256, 'conv6_1')(up6))
        conv6 = lrelu(conv(256, 'conv6_2')(conv6))

        up7 = ConvTranspose2x2(128, name='upv7')(conv6)
        up7 = jnp.concatenate([up7, conv3], axis=-1)
        conv7 = lrelu(conv(128, 'conv7_1')(up7))
        conv7 = lrelu(conv(128, 'conv7_2')(conv7))

        up8 = ConvTranspose2x2(64, name='upv8')(conv7)
        up8 = jnp.concatenate([up8, conv2], axis=-1)
        conv8 = lrelu(conv(64, 'conv8_1')(up8))
        conv8 = lrelu(conv(64, 'conv8_2')(conv8))

        up9 = ConvTranspose2x2(32, name='upv9')(conv8)
        up9 = jnp.concatenate([up9, conv1], axis=-1)
        conv9 = lrelu(conv(32, 'conv9_1')(up9))
        conv9 = lrelu(conv(32, 'conv9_2')(conv9))

        return nn.Conv(self.out_channels, (1, 1), name='conv10_1')(conv9)

    def __call__(self, x):
        x, pads = pad_to_multiple(x, 32)
        return crop_pad(self.naive_forward(x), pads)
