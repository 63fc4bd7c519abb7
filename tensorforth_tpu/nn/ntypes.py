"""NN enums (reference src/nn/ntypes.h)."""


class Layer:
    (NONE, CONV, LINEAR, FLATTEN, RELU, TANH, SIGMOID, SELU, LEAKYRL,
     ELU, DROPOUT, SOFTMAX, LOGSMAX, AVGPOOL, MAXPOOL, MINPOOL,
     BATCHNM, USAMPLE, DCONV, ATTN, MOE, LNORM, EMBED, PROJ) = range(24)

    NAMES = ["output ", "conv2d ", "linear ", "flatten", "relu   ",
             "tanh   ", "sigmoid", "selu   ", "leakyrl", "elu    ",
             "dropout", "softmax", "logsmax", "avgpool", "maxpool",
             "minpool", "batchnm", "upsampl", "dconv2d", "attn   ",
             "moe    ", "lnorm  ", "embed  ", "proj   "]


class Loss:
    MSE, BCE, CE, NLL = range(4)
    NAMES = ["MSE", "BCE", "CE", "NLL"]


class Upsample:
    NEAREST, LINEAR, BILINEAR, CUBIC = range(4)


class Optimizer:
    SGD, SGDM, ADAM, ADAMW = range(4)
