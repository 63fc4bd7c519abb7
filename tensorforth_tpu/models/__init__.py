from .zoo import mnist_cnn, gan_mnist, cifar_cnn  # noqa: F401
