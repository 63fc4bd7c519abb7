from .zoo import (mnist_cnn, gan_mnist, cifar_cnn, tiny_transformer,  # noqa: F401
                  tiny_moe, tiny_lm)
