.( ## TPU extension demo: expert + pipeline parallelism ## ) cr
0 trace

.( ### a mixture-of-experts sequence classifier ) cr
8 8 16 1 nn.model                   \ 8 sequences of 8 tokens, dim 16
4 nn.attn                           \ attention block (4 heads)
2 32 4 nn.moe tanh                  \ MoE FFN: 4 experts, hidden 32, top-2
flatten 10 linear softmax
constant em
em network

.( ### forward a random batch ) cr
1024 vector randn 8 8 16 1 reshape4 constant ex
em ex forward
-1 n@ ." output sum (8 softmax rows) = " sum . drop cr

.( ### backprop + adam trains router AND experts ) cr
80 vector{ 1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0 }
8 1 10 1 reshape4 nn.onehot= drop
em ex forward loss.ce ." loss before = " . backprop 0.005 nn.adam
em ex forward loss.ce ." loss after  = " . cr drop

.( ### pipeline-parallel training: stem + repeated blocks over pp2 ) cr
16 28 28 1 nn.model
flatten 64 linear relu 64 linear relu 64 linear relu 10 linear softmax
constant pm
pm batchsize dataset mnist_train constant pd
pm pd 0.005 2 2 nn.pipe
drop

bye
