.( ## TPU extension demo: RoPE attention + sampling decoders ## ) cr
0 trace

.( ### rotary-position LM: embed -> causal+rope attn -> proj ) cr
1 12 1 1 nn.model                   \ 1 sequence of 12 token ids
16 4 nn.embed                        \ dim 16, vocab 4
layernorm 3 2 nn.attn tanh          \ flags 3 = causal + RoPE, 2 heads
layernorm 4 nn.proj softmax
constant rlm
rlm network

.( ### memorize the cycle 0 1 2 3 ... ) cr
12 vector{ 0 1 2 3 0 1 2 3 0 1 2 3 } 1 12 1 1 reshape4 constant rxin
48 vector{ 0 1 0 0  0 0 1 0  0 0 0 1  1 0 0 0
           0 1 0 0  0 0 1 0  0 0 0 1  1 0 0 0
           0 1 0 0  0 0 1 0  0 0 0 1  1 0 0 0 }
1 12 4 1 reshape4 constant rtgt
rlm rxin forward rtgt nn.onehot= drop
: rstep ( -- ) rlm rxin forward backprop 0.01 nn.adam drop ;
: rtrain ( n -- ) 1- for rstep next ;
rlm rxin forward loss.ce ." loss before = " . drop
300 rtrain
rlm rxin forward loss.ce ." , after 300 steps = " . cr drop

.( ### greedy decode continues the cycle ) cr
rlm 4 vector{ 0 1 2 3 } 8 nn.gen
." greedy:  " . cr drop

.( ### sampled decodes: temperature / top-k / nucleus top-p ) cr
rlm 4 vector{ 0 1 2 3 } 8 0.5 nn.gen
." temp.5:  " . cr drop
rlm 4 vector{ 0 1 2 3 } 8 0.8 2 nn.gen
." top-k2:  " . cr drop
rlm 4 vector{ 0 1 2 3 } 8 0.8 0 0.9 nn.gen
." top-p.9: " . cr drop

bye
