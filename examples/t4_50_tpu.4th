.( ## TPU-native extensions demo: fused epoch training ## ) cr
0 trace

.( ### build the t4_30e CNN ) cr
100 28 28 1 nn.model                \ mini-batch 100 of 28x28x1 images
0.5 10 conv2d 2 maxpool relu        \ conv block
flatten 100 linear relu             \ dense head
10 linear softmax
constant md0

.( ### bind the corpus ) cr
md0 batchsize dataset mnist_train
constant ds0

.( ### fused training: each epoch is ONE compiled XLA program ) cr
md0 ds0 0.001 5 nn.train            \ ( M D lr epochs -- M )

.( ### evaluate on the next batch ) cr
ds0 rewind
md0 ds0 forward
nn.hit ." hits/100 = " . cr

.( ### persist ) cr
s" /tmp/t4_50_tpu.t4" save
drop

bye
