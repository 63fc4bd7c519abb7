.( ## TPU extension demo: attention tier ## ) cr
0 trace

.( ### a tiny transformer classifier: [N,S,E] tokens ) cr
8 16 32 1 nn.model                  \ 8 sequences of 16 tokens, dim 32
4 nn.attn tanh                      \ attention block 1 (4 heads)
4 nn.attn tanh                      \ attention block 2
flatten 10 linear softmax
constant tf0
tf0 network

.( ### forward a random batch ) cr
8 16 32 1 tensor randn forward
-1 n@ ." output sum (8 softmax rows) = " sum . drop cr

.( ### backprop + adam ) cr
80 vector{ 1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0
           1 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0 }
8 1 10 1 reshape4
backprop
0.001 nn.adam
." trained one step, dW zeroed: " 0 nn.dw sum . cr

bye
